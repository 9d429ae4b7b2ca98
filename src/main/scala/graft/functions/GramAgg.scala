package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass Gram-matrix + column-sum + count aggregate over quantized
  * (integer) vectors: buffer = [n, S_0..S_{d-1}, G upper triangle
  * row-major], all exact longs. Bounded state (1 + d + d(d+1)/2 longs),
  * partial-aggregated map-side and merged by elementwise add, so the
  * covariance of a 100 TB embedding table reduces to ONE fixed-size
  * array per partition — the same mergeable-moments shape as the
  * centroid aggregates, never an n×n or shuffle-the-rows pass. Exact
  * integer sums are order-independent, so the DuckDB oracle replays
  * them bit-for-bit from an unnest-pair aggregation (q166).
  */
class GramAgg(d: Int) extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(d > 0, s"d must be positive, got $d")
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    require(v.length == d, s"vector length ${v.length} != $d")
    val a = v.toArray
    buf(0) += 1L
    var j = 0
    var t = 1 + d
    while (j < d) {
      buf(1 + j) += a(j)
      var k = j
      while (k < d) {
        buf(t) += a(j) * a(k)
        t += 1
        k += 1
      }
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object GramAgg {
  /** Column-level entry point: GramAgg(64)(quantizedVecCol). */
  def apply(d: Int): Column => Column = c => udaf(new GramAgg(d)).apply(c)

  /** Index of G(j, k) (j <= k) inside the packed buffer. */
  def triIndex(d: Int, j: Int, k: Int): Int =
    1 + d + (j * (2 * d - j + 1)) / 2 + (k - j)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog register sketch (Flajolet et al. 2007) as a mergeable
  * `Aggregator`: input is the pre-computed 60-bit cross-engine hash
  * (`Dedup.md5Hash64`), the buffer is the fixed 64-register array —
  * bounded state, merged by elementwise max, which is commutative,
  * associative AND idempotent, so unlike the Misra–Gries sketch the
  * result is fully merge-tree-independent (no estimation drift, no
  * second exact pass needed). That also makes it the right distinct-
  * count state for a Complete-mode STREAMING aggregate: registers only
  * grow, so the final micro-batch snapshot equals the batch registers
  * over the same rows (q193's gate).
  *
  * Register math mirrors q186's SQL exactly: bucket = h % 64, w = h/64
  * (54 bits), rho = 55 - (floor(log2 w) + 1) computed with integer ops
  * (numberOfLeadingZeros), w = 0 → 55. At 100 TB the whole shuffle is
  * 64 longs per partition partial.
  */
class HllSketch extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val bucket = (h % 64).toInt // h is nonnegative (low 60 bits of md5)
    val w = h >>> 6
    val rho =
      if (w == 0L) 55L
      else 55L - (64L - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object HllSketch {
  /** Column-level entry point: HllSketch()(hashCol). */
  def apply(): Column => Column = c => udaf(new HllSketch).apply(c)
}

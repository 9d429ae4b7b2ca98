package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a mergeable
  * `Aggregator`: the buffer is the sorted array of the k smallest
  * DISTINCT hash values seen — bounded state (k longs), partial-
  * aggregated map-side and merged associatively, so a 1000-executor
  * aggregation shuffles k values per group instead of every distinct
  * hash (the window/row_number formulation ships them all to one task).
  *
  * With uniform hashes over [0, 2^60): estimate = (k-1) * 2^60 / h_(k)
  * when k values were collected, or the exact distinct count while the
  * buffer is not yet full. Deterministic given the hash — the DuckDB
  * oracle reproduces it exactly (q47).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** 2^60 — the hash space of [[graft.operators.Dedup.md5Hash64]]. */
  private val space = math.pow(2, 60)

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    // saturated fast path: after the buffer fills, almost every value is
    // >= the k-th minimum — one compare instead of a binary search
    if (buf.length == k && v >= buf(k - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else if (buf.length < k) {
      val ins = -pos - 1
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (v >= buf(k - 1)) buf // larger than current k-th min
    else {
      val ins = -pos - 1
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    var first = true
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (first || v != last) { out(n) = v; n = n + 1; first = false; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble // exact while not saturated
    else (k - 1).toDouble * space / buf(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** Column-level entry point: kmv(256)(hashCol). */
  def apply(k: Int): Column => Column = c => udaf(new KmvSketch(k)).apply(c)
}

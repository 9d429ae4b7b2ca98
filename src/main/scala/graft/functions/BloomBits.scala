package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom-filter bit array as a mergeable Aggregator: input = a bit
  * POSITION in [0, m), buffer = the m-bit array packed into m/64 longs,
  * merge = bitwise OR. State is bounded (m/64 longs) and partial-
  * aggregated map-side, so building the filter over N eval n-grams
  * shuffles one fixed-size array per partition instead of N positions —
  * and the finished filter broadcasts to every scan task as ONE row.
  *
  * Membership (all k hash positions set) has no false negatives, so an
  * exact verify join AFTER the prefilter returns exactly the unfiltered
  * answer; the filter only bounds how many rows reach that join. That is
  * the 100 TB decontamination shape: the broadcast bit array prunes
  * training n-grams map-side inside the scan stage, and only the
  * (tiny) candidate set pays the join (q162).
  */
class BloomBits(m: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
  private val nWords = m / 64

  override def zero: Array[Long] = new Array[Long](nWords)

  override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < m, s"position $pos out of [0, $m)")
    val p = pos.toInt
    buf(p >>> 6) |= 1L << (p & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomBits {
  /** Column-level entry point: BloomBits(65536)(positionCol). */
  def apply(m: Int): Column => Column = c => udaf(new BloomBits(m)).apply(c)
}

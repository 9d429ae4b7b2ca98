package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-quantile `Aggregator` — the custom-UDAF extension surface
  * (SURVEY §2.9/A1′). The reference's dd.Aggregation decomposition
  * (transforms.py:43-53) is only correct at npartitions=1; this one is a
  * true distributive merge (concatenate partials, sort once at finish)
  * with pandas/DuckDB linear interpolation.
  *
  * Production paths should prefer the built-in `percentile` (sort-based,
  * codegen'd); this Aggregator exists to prove the typed extension
  * surface and as the mergeable form a streaming aggregation would need.
  */
class ExactQuantile(p: Double) extends Aggregator[Double, Array[Double], Double] {
  require(p >= 0.0 && p <= 1.0, s"quantile fraction out of range: $p")

  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Double): Array[Double] = buf :+ v

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = a ++ b

  override def finish(buf: Array[Double]): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.sorted
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ExactQuantile {
  /** Column-level entry point: exactQuantile(0.25)(col). */
  def apply(p: Double): Column => Column = c => udaf(new ExactQuantile(p)).apply(c)
}

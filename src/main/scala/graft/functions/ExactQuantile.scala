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
class ExactQuantile(p: Double)
    extends Aggregator[Double, scala.collection.mutable.ArrayBuffer[Double], Double] {
  require(p >= 0.0 && p <= 1.0, s"quantile fraction out of range: $p")

  private type Buf = scala.collection.mutable.ArrayBuffer[Double]

  override def zero: Buf = new Buf

  // += is amortized O(1); the previous `buf :+ v` Array append copied
  // the whole buffer per ROW — O(k²) work per group (r20 optimization
  // round; latent scale hazard, this Aggregator is off the query paths)
  override def reduce(buf: Buf, v: Double): Buf = buf += v

  override def merge(a: Buf, b: Buf): Buf = a ++= b

  override def finish(buf: Buf): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.toArray.sorted
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ExactQuantile {
  /** Column-level entry point: exactQuantile(0.25)(col). */
  def apply(p: Double): Column => Column = c => udaf(new ExactQuantile(p)).apply(c)
}

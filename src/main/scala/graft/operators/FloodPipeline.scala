package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed `forecast` asset (discharge.py:223-409) as ONE Catalyst
  * plan: threshold percentages → control join-back → peak/tendency/
  * intensity → summary merge → intensity filter → detailed semi-join →
  * WKT geometry.
  *
  * The reference runs this as a hand-scheduled 4×4 subarea loop with
  * explicit persist/wait (discharge.py:192-213,223-238) because dask has
  * no planner; in Spark the whole thing is declarative — AQE sizes the
  * shuffles, the threshold dimension is broadcast once, and `detailed`
  * is cached because three aggregations and a semi-join genuinely reuse
  * it (the only materialization the plan needs).
  */
object FloodPipeline {

  val HalfGrid: Double = 0.05 / 2
  val Precision: Int = 3

  /** Returns (detailed_forecast, summary_forecast) — the two parquet
    * sinks of the reference job.
    */
  def run(forecast: DataFrame, thresholds: DataFrame): (DataFrame, DataFrame) = {
    val cell = Seq("latitude", "longitude")
    val detailed = FloodOps.withControl(
      FloodOps.thresholdPercentages(
        FloodOps.roundCoords(forecast, Precision),
        FloodOps.roundCoords(thresholds, Precision))).cache()

    val peak = FloodOps.peakTiming(detailed)
    val tend = FloodOps.tendency(detailed)
    val inten = FloodOps.intensity(detailed)

    // J4 summary merge (discharge.py:333-338) + P6 intensity filter (:341-343)
    val summary = peak
      .join(tend, cell, "left")
      .join(inten, cell, "left")
      .filter(col("intensity") =!= FloodOps.Intensities("gray"))
    val summaryWkt = FloodOps.addGeometry(summary, HalfGrid, Precision)

    // J5 semi-join of detailed against the surviving summary cells (:347-352)
    val detailedWkt = FloodOps.addGeometry(
      detailed.join(summary.select(cell.map(col): _*), cell, "left_semi"),
      HalfGrid, Precision)

    (detailedWkt, summaryWkt)
  }
}

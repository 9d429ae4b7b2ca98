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

  /** Single-pass summary: peak timing, tendency, and intensity are all
    * aggregations over the same (latitude, longitude) groups, so instead
    * of the reference's three grouped frames merged by two joins
    * (discharge.py:333-338), compute everything in ONE aggregate — the
    * top-1-row peak selection becomes `max_by` with a lexicographic
    * (condition, median_dis, -step) ordering struct, identical to the
    * row_number window tie-break of FloodOps.peakTiming. One shuffle,
    * no windows, no joins. Semantics are pinned by the q61 DuckDB oracle
    * and FloodPipelineSpec against the composed operator forms.
    */
  def summarize(detailed: DataFrame): DataFrame = {
    val cond = when(col("p_above_20y") >= 0.3, 4)
      .when(col("p_above_5y") >= 0.3, 3)
      .when(col("p_above_2y") >= 0.3, 2)
      .otherwise(1)
    detailed
      .groupBy("latitude", "longitude")
      .agg(
        min("issued_on").as("issued_on"),
        max_by(struct(col("step"), col("valid_for")),
          struct(cond.as("c"), col("median_dis"), (-col("step")).as("ns")))
          .as("_peak"),
        max(when(col("step").between(1, 10), col("p_above_2y")))
          .as("max_2y_start"),
        max("median_dis").as("max_median_dis"),
        min("median_dis").as("min_median_dis"),
        max("control_dis").as("control_dis"), // constant per cell
        max("max_dis").as("max_max_dis"),
        min("min_dis").as("min_min_dis"),
        max("p_above_20y").as("max_p_above_20y"),
        max("p_above_5y").as("max_p_above_5y"),
        max("p_above_2y").as("max_p_above_2y"))
      .withColumn("peak_step", col("_peak.step"))
      .withColumn("peak_day", col("_peak.valid_for"))
      .drop("_peak")
      .withColumn("peak_timing",
        when(col("peak_step").isin(1, 2, 3) && col("max_2y_start") >= 0.30,
          FloodOps.PeakTimings("black_border"))
          .when(col("peak_step") > 10 && col("max_2y_start") < 0.30,
            FloodOps.PeakTimings("grayed_color"))
          .otherwise(FloodOps.PeakTimings("gray_border")))
      .withColumn("tendency",
        when(col("max_median_dis") > col("control_dis") * 1.10,
          FloodOps.Tendencies("increasing"))
          .when(col("min_median_dis") <= col("control_dis") * 0.90 &&
            col("max_median_dis") <= col("control_dis") * 1.10,
            FloodOps.Tendencies("decreasing"))
          .otherwise(FloodOps.Tendencies("stagnant")))
      .withColumn("intensity",
        when(col("max_p_above_20y") >= 0.30, FloodOps.Intensities("purple"))
          .when(col("max_p_above_5y") >= 0.30, FloodOps.Intensities("red"))
          .when(col("max_p_above_2y") >= 0.30, FloodOps.Intensities("yellow"))
          .otherwise(FloodOps.Intensities("gray")))
      .drop("max_2y_start")
      .filter(col("intensity") =!= FloodOps.Intensities("gray"))
  }

  /** Returns (detailed_forecast, summary_forecast) — the two parquet
    * sinks of the reference job.
    */
  def run(forecast: DataFrame, thresholds: DataFrame): (DataFrame, DataFrame) = {
    val cell = Seq("latitude", "longitude")
    val detailed = FloodOps.withControl(
      FloodOps.thresholdPercentages(
        FloodOps.roundCoords(forecast, Precision),
        FloodOps.roundCoords(thresholds, Precision))).cache()

    val summary = summarize(detailed)
    val summaryWkt = FloodOps.addGeometry(summary, HalfGrid, Precision)

    // J5 semi-join of detailed against the surviving summary cells
    // (discharge.py:347-352); the summary key set is small → broadcast
    val detailedWkt = FloodOps.addGeometry(
      detailed.join(broadcast(summary.select(cell.map(col): _*)), cell, "left_semi"),
      HalfGrid, Precision)

    (detailedWkt, summaryWkt)
  }
}

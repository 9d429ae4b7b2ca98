package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sql

/** Flood-forecast relational operators — the analytic core of the reference
  * (data_pipelines/utils/flood/transforms.py), re-expressed Spark-first.
  *
  * Differences from the reference's dask implementation (intentional):
  *  - grouped quantiles are globally exact (`percentile`), not the
  *    partition-local dd.Aggregation decomposition (transforms.py:43-53)
  *    whose median combiner is only correct at npartitions=1 — we match
  *    the *intended* semantics pinned by the goldens
  *    (test_transforms.py:4102-4147);
  *  - join-back-of-aggregate patterns (max_2y_start, control_dis) are
  *    unbounded windows over (latitude, longitude) — no extra join, one
  *    shuffle, globally correct at any partitioning (the reference's
  *    map_partitions sort+first relies on groups being partition-local);
  *  - top-1-per-group uses row_number with a documented deterministic
  *    tie-break (condition desc, median_dis desc, step asc) — the
  *    reference leaves ties unspecified (SURVEY §7.4.4).
  */
object FloodOps {

  val Tendencies = Map("increasing" -> "U", "stagnant" -> "C", "decreasing" -> "D")
  val Intensities = Map("purple" -> "P", "red" -> "R", "yellow" -> "Y", "gray" -> "G")
  val PeakTimings = Map("black_border" -> "BB", "grayed_color" -> "GC", "gray_border" -> "GB")
  val RetPeriods: Seq[Int] = Seq(2, 5, 20)

  private val cell = Seq("latitude", "longitude")

  /** exceed flag matching pandas `(dis24 >= t).astype(int64)`: NaN/null
    * comparison yields False → 0, never null (transforms.py:37-41).
    */
  private def exceedFlag(thresholdCol: String): Column =
    coalesce((col("dis24") >= col(thresholdCol)).cast("long"), lit(0L))

  /** compute_flood_threshold_percentages (transforms.py:13-76):
    * forecast ⋈ broadcast(thresholds) on the grid cell, exceedance flags,
    * then grouped ensemble stats with exact quantiles.
    */
  def thresholdPercentages(
      forecast: DataFrame,
      thresholds: DataFrame,
      retPeriods: Seq[Int] = RetPeriods): DataFrame = {
    val joined = forecast.join(broadcast(thresholds), cell, "left")
    val flagged = retPeriods.foldLeft(joined) { (df, p) =>
      df.withColumn(s"exceed_${p}y", exceedFlag(s"threshold_${p}y"))
    }
    val pCols = retPeriods.map(p =>
      (sum(col(s"exceed_${p}y")).cast("double") / count(col(s"exceed_${p}y")))
        .as(s"p_above_${p}y"))
    // All three exact quantiles come from ONE sorted-array aggregate:
    // ensemble groups are small (~51 members), so collecting + sorting
    // per group beats three independent `percentile` aggregates (each
    // builds a per-group counts hashmap) — measured ~20% off the grouped
    // stage at sf0.1 and bit-identical output (same linear-interpolation
    // formula on the same doubles).
    val aggs: Seq[Column] = Seq(
      min("dis24").as("min_dis"),
      array_sort(collect_list(col("dis24"))).as("_sorted"),
      max("dis24").as("max_dis")) ++ pCols
    flagged
      .groupBy("latitude", "longitude", "issued_on", "valid_for", "step")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("q1_dis", sortedQuantile(col("_sorted"), 0.25))
      .withColumn("median_dis", sortedQuantile(col("_sorted"), 0.5))
      .withColumn("q3_dis", sortedQuantile(col("_sorted"), 0.75))
      .drop("_sorted")
      .select(Seq("latitude", "longitude", "issued_on", "valid_for", "step",
        "min_dis", "q1_dis", "median_dis", "q3_dis", "max_dis").map(col) ++
        retPeriods.map(p => col(s"p_above_${p}y")): _*)
  }

  /** Exact linear-interpolation quantile of a pre-sorted array — the
    * identical arithmetic of the builtin `percentile` aggregate
    * (value = lower + (higher - lower) * fraction on the same doubles),
    * evaluated as plain codegen'd expressions. Null/empty-safe.
    */
  private def sortedQuantile(sorted: Column, p: Double): Column = {
    val n = size(sorted)
    val pos = (n - lit(1)).cast("double") * p
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    val a = element_at(sorted, lo + 1)
    val b = element_at(sorted, least(lo + lit(2), n))
    when(n > 0, a + (b - a) * frac).otherwise(lit(null).cast("double"))
  }

  /** Control join-back (discharge.py:292-302): median_dis of the step==1
    * row becomes a per-cell `control_dis` scalar — as a window, no join.
    */
  def withControl(detailed: DataFrame): DataFrame = {
    val w = Window.partitionBy(cell.map(col): _*)
    detailed.withColumn("control_dis",
      max(when(col("step") === 1, col("median_dis"))).over(w))
  }

  /** compute_flood_peak_timing (transforms.py:79-166). */
  def peakTiming(detailed: DataFrame, colName: String = "peak_timing"): DataFrame = {
    val w = Window.partitionBy(cell.map(col): _*)
    val withCond = detailed
      .select((cell :+ "issued_on" :+ "valid_for" :+ "step" :+ "median_dis" :+
        "p_above_2y" :+ "p_above_5y" :+ "p_above_20y").map(col): _*)
      .withColumn("max_2y_start",
        max(when(col("step").between(1, 10), col("p_above_2y"))).over(w))
      .withColumn("condition",
        when(col("p_above_20y") >= 0.3, 4)
          .when(col("p_above_5y") >= 0.3, 3)
          .when(col("p_above_2y") >= 0.3, 2)
          .otherwise(1))
    val pick = Window.partitionBy(cell.map(col): _*)
      .orderBy(col("condition").desc, col("median_dis").desc, col("step").asc)
    withCond
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .withColumnRenamed("step", "peak_step")
      .withColumnRenamed("valid_for", "peak_day")
      .withColumn(colName,
        when(col("peak_step").isin(1, 2, 3) && col("max_2y_start") >= 0.30,
          PeakTimings("black_border"))
          .when(col("peak_step") > 10 && col("max_2y_start") < 0.30,
            PeakTimings("grayed_color"))
          .otherwise(PeakTimings("gray_border")))
      .select((cell :+ "issued_on" :+ "peak_step" :+ "peak_day" :+ colName).map(col): _*)
  }

  /** compute_flood_tendency (transforms.py:169-213). */
  def tendency(detailed: DataFrame, colName: String = "tendency"): DataFrame =
    detailed
      .groupBy(cell.map(col): _*)
      .agg(
        max("median_dis").as("max_median_dis"),
        min("median_dis").as("min_median_dis"),
        first("control_dis").as("control_dis"),
        max("max_dis").as("max_max_dis"),
        min("min_dis").as("min_min_dis"))
      .withColumn(colName,
        when(col("max_median_dis") > col("control_dis") * 1.10,
          Tendencies("increasing"))
          .when(col("min_median_dis") <= col("control_dis") * 0.90 &&
            col("max_median_dis") <= col("control_dis") * 1.10,
            Tendencies("decreasing"))
          .otherwise(Tendencies("stagnant")))

  /** compute_flood_intensity (transforms.py:216-265). */
  def intensity(detailed: DataFrame, colName: String = "intensity"): DataFrame =
    detailed
      .groupBy(cell.map(col): _*)
      .agg(
        max("p_above_20y").as("max_p_above_20y"),
        max("p_above_5y").as("max_p_above_5y"),
        max("p_above_2y").as("max_p_above_2y"))
      .withColumn(colName,
        when(col("max_p_above_20y") >= 0.30, Intensities("purple"))
          .when(col("max_p_above_5y") >= 0.30, Intensities("red"))
          .when(col("max_p_above_2y") >= 0.30, Intensities("yellow"))
          .otherwise(Intensities("gray")))

  /** add_geometry (transforms.py:268-315): WKT grid-cell box with
    * pandas-`astype(str)`-compatible float formatting (goldens
    * test_transforms.py:4203-4214).
    */
  def addGeometry(df: DataFrame, halfGridSize: Double, precision: Int): DataFrame = {
    def f(c: Column): Column =
      graft.functions.PandasFloatString(c, precision)
    val (minLat, maxLat) =
      (f(col("latitude") - halfGridSize), f(col("latitude") + halfGridSize))
    val (minLon, maxLon) =
      (f(col("longitude") - halfGridSize), f(col("longitude") + halfGridSize))
    df.withColumn("wkt",
      concat(lit("POLYGON (("),
        minLon, lit(" "), minLat, lit(","),
        minLon, lit(" "), maxLat, lit(","),
        maxLon, lit(" "), maxLat, lit(","),
        maxLon, lit(" "), minLat, lit(","),
        minLon, lit(" "), minLat, lit("))")))
  }

  /** restrict_dataset_area (utils/flood/utils.py:4-29): inclusive
    * label-slice semantics with a widening buffer.
    */
  def restrictArea(
      df: DataFrame,
      latMin: Double, latMax: Double,
      lonMin: Double, lonMax: Double,
      buffer: Double = 0.0125): DataFrame =
    df.filter(
      col("latitude") >= latMin - buffer && col("latitude") <= latMax + buffer &&
        col("longitude") >= lonMin - buffer && col("longitude") <= lonMax + buffer)

  /** Join-key stabilization (discharge.py:265-270): round coordinates to
    * the grid precision before any equi-join.
    */
  def roundCoords(df: DataFrame, precision: Int = 3): DataFrame =
    df.withColumn("latitude", round(col("latitude"), precision))
      .withColumn("longitude", round(col("longitude"), precision))
}

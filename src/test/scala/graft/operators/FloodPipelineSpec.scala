package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pipeline composition smoke over the threshold-percentages
  * golden fixture: the summary keeps only non-gray cells, the detailed
  * output is semi-joined to them, and both carry WKT.
  */
class FloodPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("composed pipeline produces summary + matching detailed cells") {
    // 10-member ensemble at two cells over 3 steps; cell A floods, cell B quiet
    val forecast = (for {
      n <- 1 to 10; step <- 1 to 3
    } yield {
      val a = (n, 0.525, 0.525, "2023-10-01", step, s"2023-10-0$step",
        100.0 + n * 10 + step * 40) // above thresholds, median rising >10%/step
      val b = (n, 2.525, 0.525, "2023-10-01", step, s"2023-10-0$step", 1.0)
      Seq(a, b)
    }).flatten
      .toDF("number", "latitude", "longitude", "issued_on", "step", "valid_for", "dis24")
      .withColumn("issued_on", col("issued_on").cast("date"))
      .withColumn("valid_for", col("valid_for").cast("date"))
    val thresholds = Seq(
      (0.525, 0.525, 50.0, 90.0, 140.0),
      (2.525, 0.525, 50.0, 90.0, 140.0))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    val (detailed, summary) = FloodPipeline.run(forecast, thresholds)
    val sRows = summary.collect()
    assert(sRows.length == 1) // only the flooding cell survives the gray filter
    val s = sRows(0)
    assert(s.getAs[Double]("latitude") == 0.525)
    assert(s.getAs[String]("intensity") == "P") // p_above_20y >= 0.3
    assert(s.getAs[String]("tendency") == "U")  // rising medians
    assert(Set("BB", "GB", "GC").contains(s.getAs[String]("peak_timing")))
    assert(s.getAs[String]("wkt").startsWith("POLYGON ((0.5 0.5,"))

    val dRows = detailed.collect()
    assert(dRows.length == 3) // 3 steps for the surviving cell only
    assert(dRows.forall(_.getAs[Double]("latitude") == 0.525))
    assert(dRows.forall(_.getAs[String]("wkt").nonEmpty))
  }

  test("single-pass summarize equals the composed window/join operator path") {
    // random-ish multi-cell ensemble: 40 cells, 10 members, 8 steps
    val rnd = new scala.util.Random(7)
    val forecast = (for {
      cell <- 0 until 40; n <- 1 to 10; step <- 1 to 8
    } yield (n, (cell % 8) * 0.5 + 0.25, (cell / 8) * 0.5 + 0.25,
      "2023-10-01", step, f"2023-10-${step + 1}%02d",
      rnd.nextDouble() * 200.0))
      .toDF("number", "latitude", "longitude", "issued_on", "step", "valid_for", "dis24")
      .withColumn("issued_on", col("issued_on").cast("date"))
      .withColumn("valid_for", col("valid_for").cast("date"))
    val thresholds = (0 until 40)
      .map(c => ((c % 8) * 0.5 + 0.25, (c / 8) * 0.5 + 0.25, 60.0, 120.0, 170.0))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

    val detailed = FloodOps.withControl(
      FloodOps.thresholdPercentages(forecast, thresholds))

    val onePass = FloodPipeline.summarize(detailed)
      .select("latitude", "longitude", "peak_step", "peak_day", "peak_timing",
        "tendency", "intensity")
      .collect().map(_.toSeq).toSet

    val composed = {
      val cellCols = Seq("latitude", "longitude")
      FloodOps.peakTiming(detailed)
        .join(FloodOps.tendency(detailed), cellCols, "left")
        .join(FloodOps.intensity(detailed), cellCols, "left")
        .filter(col("intensity") =!= "G")
        .select("latitude", "longitude", "peak_step", "peak_day", "peak_timing",
          "tendency", "intensity")
        .collect().map(_.toSeq).toSet
    }
    assert(onePass.nonEmpty)
    assert(onePass == composed)
  }
}

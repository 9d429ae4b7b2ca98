package graft.operators

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Goldens ported from the reference test suite
  * (data_pipelines_tests/flood/test_transforms.py) — values are
  * engine-independent semantics oracles (SURVEY §5).
  */
class FloodOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- rounding (test_transforms.py:55-121) ------------------------------

  test("round to grid precision matches pandas round goldens") {
    val df = Seq(19.0750000024, 17.324999994).toDF("value")
      .withColumn("rounded", round(col("value"), 3))
    assert(df.select("rounded").as[Double].collect().toSeq == Seq(19.075, 17.325))
  }

  test("join after rounding recovers the grid-cell match") {
    val df1 = Seq((19.0750000024, 17.32499999, 5)).toDF("latitude", "longitude", "val1")
    val df2 = Seq((19.0749999999, 17.325000006, 10)).toDF("latitude", "longitude", "val2")
    assert(df1.join(df2, Seq("latitude", "longitude")).count() == 0)
    val j = FloodOps.roundCoords(df1).join(
      FloodOps.roundCoords(df2), Seq("latitude", "longitude"))
    val rows = j.collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(0) == 19.075 && rows(0).getDouble(1) == 17.325)
    assert(rows(0).getInt(2) == 5 && rows(0).getInt(3) == 10)
  }

  // ---- threshold percentages (test_transforms.py:4004-4163) --------------

  private def forecastFixture: DataFrame = {
    val e1 = Seq(100.0, 50.0, 25.0, 75.0, 15.0, 105.0, 35.0, 65.0, 90.0, 120.0)
      .zipWithIndex.map { case (d, i) =>
        (i + 1, 0.5, 0.5, "2023-10-01", 1, "2023-10-01", d) }
    val e2 = Seq(11.0, 9.0, 22.0, 22.0, 14.0, 15.0, 13.0, 7.0, 8.0, 5.0)
      .zipWithIndex.map { case (d, i) =>
        (i + 1, 2.5, 0.5, "2023-10-05", 17, "2023-10-21", d) }
    val e3 = Seq(11.0, 9.0, 22.0, 22.0, 14.0, 15.0, 13.0, 7.0, 8.0, 5.0, 6.0)
      .zipWithIndex.map { case (d, i) =>
        (i + 1, 5.5, 1.5, "2023-10-01", 9, "2023-10-09", d) }
    (e1 ++ e2 ++ e3)
      .toDF("number", "latitude", "longitude", "issued_on", "step", "valid_for", "dis24")
  }

  private def thresholdFixture: DataFrame = Seq(
    (0.5, 0.5, 20.0, 50.0, 120.0),
    (2.5, 0.5, 9.0, 11.0, 15.0),
    (5.5, 1.5, 10.0, 13.0, 16.0))
    .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")

  test("thresholdPercentages matches the exact-quantile goldens") {
    val out = FloodOps.thresholdPercentages(forecastFixture, thresholdFixture)
      .orderBy("latitude", "longitude")
      .select("latitude", "longitude", "step",
        "p_above_2y", "p_above_5y", "p_above_20y",
        "min_dis", "q1_dis", "median_dis", "q3_dis", "max_dis")
      .collect()
    assert(out.length == 3)
    val r1 = out(0).toSeq
    assert(r1 == Seq(0.5, 0.5, 1, 0.9, 0.7, 0.1, 15.0, 38.75, 70.0, 97.5, 120.0))
    val r2 = out(1).toSeq
    assert(r2 == Seq(2.5, 0.5, 17, 0.7, 0.6, 0.3, 5.0, 8.25, 12.0, 14.75, 22.0))
    val r3 = out(2).toSeq
    assert(r3 == Seq(5.5, 1.5, 9, 6.0 / 11, 5.0 / 11, 2.0 / 11, 5.0, 7.5, 11.0, 14.5, 22.0))
  }

  test("thresholdPercentages treats missing thresholds as non-exceeding (NaN semantics)") {
    val th = Seq((0.5, 0.5, 20.0, 50.0, 120.0))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")
    val fc = forecastFixture.filter(col("latitude") === 2.5) // no threshold row
    val out = FloodOps.thresholdPercentages(fc, th).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Double]("p_above_2y") == 0.0)
    assert(r.getAs[Double]("p_above_20y") == 0.0)
  }

  // ---- tendency (test_transforms.py:124-384) -----------------------------

  private val detailedSchema = Seq("latitude", "longitude", "control_dis",
    "issued_on", "valid_for", "step", "p_above_2y", "p_above_5y", "p_above_20y",
    "min_dis", "q1_dis", "median_dis", "q3_dis", "max_dis")

  test("tendency matches U/D/C goldens including exact-boundary cases") {
    val rows = Seq(
      (0.0, 0.5, 10.0, "2023-10-02", "2023-10-02", 1, 0.1, 0.2, 0.3, 9.0, 10.0, 11.0, 12.0, 13.0),
      (0.0, 0.5, 10.0, "2023-10-02", "2023-10-03", 2, 0.1, 0.2, 0.3, 10.0, 11.0, 12.5, 13.0, 14.0),
      (0.0, 0.5, 10.0, "2023-10-02", "2023-10-04", 3, 0.1, 0.2, 0.3, 10.5, 11.5, 15.0, 16.0, 17.0),
      (1.25, 1.0, 20.0, "2023-10-02", "2023-10-02", 1, 0.1, 0.2, 0.3, 17.0, 18.0, 17.5, 20.0, 21.0),
      (1.25, 1.0, 20.0, "2023-10-02", "2023-10-03", 2, 0.1, 0.2, 0.3, 16.0, 17.0, 17.8, 20.0, 21.5),
      (1.25, 1.0, 20.0, "2023-10-02", "2023-10-04", 3, 0.1, 0.2, 0.3, 16.5, 17.5, 18.0, 20.5, 21.5),
      (2.0, 2.6, 25.0, "2023-10-02", "2023-10-02", 1, 0.1, 0.2, 0.3, 23.0, 24.0, 25.0, 26.0, 27.0),
      (2.0, 2.6, 25.0, "2023-10-02", "2023-10-03", 2, 0.1, 0.2, 0.3, 24.0, 25.0, 26.0, 27.0, 28.0),
      (2.0, 2.6, 25.0, "2023-10-02", "2023-10-04", 3, 0.1, 0.2, 0.3, 23.5, 24.5, 26.5, 27.5, 28.5),
      (3.0, 3.1, 30.0, "2023-10-02", "2023-10-02", 1, 0.1, 0.2, 0.3, 29.0, 29.5, 33.0, 34.0, 35.0),
      (3.0, 3.1, 30.0, "2023-10-02", "2023-10-03", 2, 0.1, 0.2, 0.3, 20.0, 21.5, 27.001, 28.0, 29.0))
      .toDF(detailedSchema: _*)
    val got = FloodOps.tendency(rows).orderBy("latitude")
      .select("latitude", "longitude", "tendency").as[(Double, Double, String)]
      .collect().toSeq
    assert(got == Seq((0.0, 0.5, "U"), (1.25, 1.0, "D"), (2.0, 2.6, "C"), (3.0, 3.1, "C")))
  }

  // ---- intensity (test_transforms.py:387-594) ----------------------------

  test("intensity matches P/R/Y/G ladder goldens including 0.30 boundaries") {
    val rows = Seq(
      (0.0, 0.5, 20.0, "2023-10-02", "2023-10-02", 1, 0.55, 0.45, 0.3, 15.0, 16.0, 17.0, 18.0, 19.0),
      (0.0, 0.5, 20.0, "2023-10-02", "2023-10-03", 2, 0.15, 0.25, 0.25, 16.0, 17.0, 18.0, 19.0, 20.0),
      (1.4, 1.0, 25.0, "2023-10-02", "2023-10-02", 1, 0.5, 0.3, 0.29, 20.0, 21.0, 22.0, 23.0, 24.0),
      (1.4, 1.0, 25.0, "2023-10-02", "2023-10-03", 2, 0.31, 0.29, 0.29, 21.0, 22.0, 23.0, 24.0, 25.0),
      (2.225, 2.0, 30.0, "2023-10-02", "2023-10-02", 1, 0.30, 0.29, 0.29, 25.0, 26.0, 27.0, 28.0, 29.0),
      (2.225, 2.0, 30.0, "2023-10-02", "2023-10-03", 2, 0.29, 0.28, 0.18, 26.0, 27.0, 28.0, 29.0, 30.0),
      (3.0, 3.925, 35.0, "2023-10-02", "2023-10-02", 1, 0.25, 0.2, 0.15, 30.0, 31.0, 32.0, 33.0, 34.0),
      (3.0, 3.925, 35.0, "2023-10-02", "2023-10-03", 2, 0.29, 0.29, 0.29, 31.0, 32.0, 33.0, 34.0, 35.0))
      .toDF(detailedSchema: _*)
    val got = FloodOps.intensity(rows).orderBy("latitude")
      .select("latitude", "longitude", "intensity").as[(Double, Double, String)]
      .collect().toSeq
    assert(got == Seq((0.0, 0.5, "P"), (1.4, 1.0, "R"), (2.225, 2.0, "Y"), (3.0, 3.925, "G")))
  }

  // ---- peak timing (test_transforms.py:597-4001; fixture extracted to CSV)

  test("peakTiming matches the six-scenario golden fixture") {
    val fixture = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(getClass.getResource("/peak_timing_fixture.csv").toString)
      .withColumn("valid_for", col("valid_for").cast("date"))
    val got = FloodOps.peakTiming(fixture)
      .select("latitude", "longitude", "peak_step", "peak_day", "peak_timing")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) ->
        ((r.getInt(2), r.getAs[Date]("peak_day").toString, r.getString(4))))
      .toMap
    assert(got((2.275, 2.0)) == ((2, "2023-10-03", "BB")))
    assert(got((0.0, 0.975)) == ((11, "2023-10-12", "GC")))
    assert(got((1.475, 1.025)) == ((7, "2023-10-08", "GB")))
    assert(got((5.0, 0.975)) == ((26, "2023-10-27", "GC")))
    assert(got((3.0, 2.975)) == ((14, "2023-10-15", "GC")))
    assert(got((8.275, 2.325)) == ((30, "2023-10-31", "GC")))
  }

  // ---- add_geometry (test_transforms.py:4166-4214) -----------------------

  test("addGeometry produces pandas-formatted WKT goldens") {
    val df = Seq(
      (16.975, -17.975, 20.0, 21.0, 22.0),
      (2.225, 2.475, 30.0, 32.0, 39.0),
      (-0.525, 3.925, 35.0, 39.0, 44.0))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")
    val got = FloodOps.addGeometry(df, 0.025, 3)
      .select("latitude", "wkt").as[(Double, String)].collect().toMap
    assert(got(16.975) ==
      "POLYGON ((-18.0 16.95,-18.0 17.0,-17.95 17.0,-17.95 16.95,-18.0 16.95))")
    assert(got(2.225) ==
      "POLYGON ((2.45 2.2,2.45 2.25,2.5 2.25,2.5 2.2,2.45 2.2))")
    assert(got(-0.525) ==
      "POLYGON ((3.9 -0.55,3.9 -0.5,3.95 -0.5,3.95 -0.55,3.9 -0.55))")
  }

  // ---- restrict area (test_restrict_dataset_area.py:15-55) ---------------

  test("restrictArea applies inclusive label-slice bounds with buffer") {
    val res = 0.05
    val lats = (0 until 40).map(i => 1.0 + res / 2 + i * res) // ascending is fine for the filter form
    val lons = (0 until 40).map(j => 10.0 + res / 2 + j * res)
    val grid = lats.flatMap(la => lons.map(lo => (la, lo))).toDF("latitude", "longitude")
    val out = FloodOps.restrictArea(grid, 1.5, 2.0, 10.5, 11.0, buffer = res / 4)
    val agg = out.agg(
      min("latitude"), max("latitude"), min("longitude"), max("longitude"),
      count(lit(1))).collect()(0)
    // expected bounds: first grid center >= bound - buffer (1 ulp tolerance
    // for the accumulated i*res grid construction)
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(approx(agg.getDouble(0), 1.525) && approx(agg.getDouble(1), 1.975))
    assert(approx(agg.getDouble(2), 10.525) && approx(agg.getDouble(3), 10.975))
  }
}

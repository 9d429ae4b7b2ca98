package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the EPSG:3857 forward/inverse pair: known anchor values from the
  * public spherical formulas, inverse∘forward identity at sub-micrometer
  * tolerance, and gdal-style snap semantics.
  */
class GeoProjectSpec extends SparkSpec {
  import spark.implicits._

  test("forward matches the public EPSG:3857 anchors") {
    val r = Seq((0.0, 0.0), (180.0, 0.0), (6.0, 45.0))
      .toDF("lon", "lat")
      .select(GeoProject.mercX(col("lon")).as("x"),
        GeoProject.mercY(col("lat")).as("y"))
      .collect()
    // y(0) = R·ln(tan(π/4)) ≈ -7e-10 m, not exactly 0: tan(π/4) rounds
    // to 0.9999999999999999 in doubles — sub-nanometer, not a defect
    assert(r(0).getDouble(0) == 0.0 && math.abs(r(0).getDouble(1)) < 1e-6)
    // 180° E = π·R
    assert(math.abs(r(1).getDouble(0) - math.Pi * GeoProject.R) < 1e-6)
    // lat 45° → R·ln(tan(67.5°)) ≈ 5621521.486
    assert(math.abs(r(2).getDouble(1) - 5621521.486192) < 1e-3)
  }

  test("inverse ∘ forward is the identity to sub-micrometer") {
    val pts = for (i <- 0 until 1000) yield
      (-179.5 + i * 0.359, -84.9 + (i * 7 % 1000) * 0.1698)
    val bad = pts.toDF("lon", "lat")
      .select(
        abs(GeoProject.invLon(GeoProject.mercX(col("lon"))) - col("lon")).as("dlon"),
        abs(GeoProject.invLat(GeoProject.mercY(col("lat"))) - col("lat")).as("dlat"))
      .filter(col("dlon") > 1e-9 || col("dlat") > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("snap/center are gdal-style floor binning on the target grid") {
    val r = Seq(999.99, 1000.0, 1000.01, -0.5)
      .toDF("x")
      .select(GeoProject.snap(col("x"), 0.0, 1000.0).as("i"))
      .as[Long].collect().toSeq
    assert(r == Seq(0L, 1L, 1L, -1L))
    val c = Seq(1L).toDF("i")
      .select(GeoProject.center(col("i"), 0.0, 1000.0)).as[Double].head()
    assert(c == 1500.0)
  }
}

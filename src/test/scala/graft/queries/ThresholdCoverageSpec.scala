package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards the lattice-coverage invariant the q60/q61 LEFT join relies
  * on: every distinct (latitude, longitude) cell the synthetic forecast
  * construction can produce must exist in the generated threshold
  * dimension — a drift in either construction would otherwise surface
  * as silently-null thresholds (exceedance flags coalesced to 0), which
  * only the external oracle gate would catch.
  */
class ThresholdCoverageSpec extends SparkSpec {

  test("every forecast cell is covered by the threshold lattice") {
    val fc = FloodQueries.syntheticForecast(spark, "/root/testdata/sf0.001")
    val dim = FloodQueries.syntheticThresholds(spark)
    val uncovered = fc.select("latitude", "longitude").distinct()
      .join(dim, Seq("latitude", "longitude"), "left_anti")
    assert(uncovered.isEmpty,
      s"forecast cells missing from the threshold lattice: " +
        uncovered.limit(5).collect().mkString(", "))
  }

  test("lattice size matches the closed construction bounds") {
    val dim = FloodQueries.syntheticThresholds(spark)
    assert(dim.count() == FloodQueries.LatCells.toLong * FloodQueries.LonCells)
    assert(dim.select("latitude", "longitude").distinct().count() ==
      FloodQueries.LatCells.toLong * FloodQueries.LonCells)
  }
}

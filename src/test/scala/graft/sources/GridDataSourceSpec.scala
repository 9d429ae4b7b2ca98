package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GridDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def grid =
    spark.read.format("graft-grid")
      .option("latMax", 2.0).option("lonMin", 10.0)
      .option("res", 0.5).option("nLat", 6).option("nLon", 4)
      .option("partitions", 3)
      .load()

  test("graft-grid DSv2 source matches the denseGrid generator") {
    val viaSource = grid.orderBy(desc("latitude"), asc("longitude"))
      .as[(Double, Double)].collect().toSeq
    val viaGenerator = RasterContract
      .denseGrid(spark, 2.0, 10.0, 0.5, 6, 4)
      .orderBy(desc("latitude"), asc("longitude"))
      .as[(Double, Double)].collect().toSeq
    assert(viaSource == viaGenerator)
    assert(viaSource.length == 24)
  }

  test("graft-grid plans multiple input partitions (latitude bands)") {
    assert(grid.rdd.getNumPartitions == 3)
  }

  test("graft-grid prunes columns at the source") {
    val one = grid.select("longitude")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("longitude") && !plan.contains("latitude#"))
    assert(one.distinct().count() == 4)
  }

  test("graft-grid pushes bbox filters into partition planning") {
    // full grid: lat 2.0 down to -0.5 in 6 rows; restrict to the top row.
    // Clipping is conservative by one whole cell on each side (magnitude-
    // safe), so the top row plus one slack row survive planning — still a
    // strict prune of the 3 full bands — and the residual filter keeps the
    // row set exact.
    val top = grid.filter(col("latitude") >= 1.8)
    assert(top.rdd.getNumPartitions < grid.rdd.getNumPartitions)
    assert(top.count() == 4)
    // and a bbox on both axes generates just the inner window
    val box = grid.filter(col("latitude") >= 0.9 && col("latitude") <= 1.6 &&
      col("longitude") >= 10.4 && col("longitude") <= 11.1)
    assert(box.as[(Double, Double)].collect().toSet ==
      Set((1.5, 10.5), (1.5, 11.0), (1.0, 10.5), (1.0, 11.0)))
  }

  test("graft-grid pushdown agrees with post-scan filtering (exactness)") {
    val pred = col("latitude") > 0.2 && col("longitude") < 11.2
    val pushed = grid.filter(pred).as[(Double, Double)].collect().toSet
    val reference = RasterContract.denseGrid(spark, 2.0, 10.0, 0.5, 6, 4)
      .filter(pred).as[(Double, Double)].collect().toSet
    assert(pushed == reference)
  }

  test("graft-grid empty pruned window plans zero partitions") {
    val none = grid.filter(col("latitude") > 99.0)
    assert(none.count() == 0)
  }
}

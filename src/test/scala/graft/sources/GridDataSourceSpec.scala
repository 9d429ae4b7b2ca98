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
}

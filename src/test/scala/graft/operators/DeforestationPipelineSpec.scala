package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeforestationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("treeLossPerYear counts year-masked pixels per block with +2000 shift") {
    val px = Seq((10.0, 10.0, 1), (150.0, 10.0, 1), (350.0, 10.0, 2), (10.0, 20.0, 0))
      .toDF("x", "y", "lossyear")
    val out = DeforestationPipeline.treeLossPerYear(px, blockSize = 200, yearLo = 1, yearHi = 3)
      .filter(col("loss_count") > 0)
      .orderBy("year", "block_x")
      .select("year", "block_x", "loss_count").as[(Int, Long, Long)]
      .collect().toSeq
    assert(out == Seq((2001, 0L, 2L), (2002, 1L, 1L)))
  }

  test("treeLossPerBasin: dense counts, first-cell area, basin join") {
    val res = 0.5
    // two basin boxes; pixels on cell centers 0.25 + 0.5k
    val basins = Seq(
      (100L, 0.0, 1.9, 0.0, 1.9, 11.1),
      (200L, 2.0, 3.9, 0.0, 1.9, 22.2),
      (300L, 4.0, 5.9, 0.0, 1.9, 33.3)) // basin with zero loss anywhere
      .toDF("HYBAS_ID", "lat_min", "lat_max", "lon_min", "lon_max", "basin_area")
    val px = Seq(
      (0.25, 0.25, 1), (0.75, 0.25, 1), (1.25, 0.25, 2), // basin 100
      (2.25, 0.25, 1),                                   // basin 200
      (0.25, 0.75, 0),                                   // basin 100, no loss
      (4.25, 0.25, 0),                                   // basin 300, no loss at all
      (9.25, 9.25, 1))                                   // outside all basins
      .toDF("latitude", "longitude", "lossyear")
      .select(col("longitude").as("x"), col("latitude").as("y"), col("lossyear"))
    val out = DeforestationPipeline.treeLossPerBasin(
      px, basins, 0.25, 0.25, res, yearLo = 1, yearHi = 3)
    val rows = out.orderBy("HYBAS_ID", "year").collect()
    // dense universe: 3 basins × 3 years, incl the all-zero basin
    assert(rows.length == 9)
    val counts = rows.map(r => (r.getAs[Long]("HYBAS_ID"), r.getAs[Int]("year"),
      r.getAs[Long]("tree_loss_incidents"))).toSeq
    assert(counts == Seq(
      (100L, 2001, 2L), (100L, 2002, 1L), (100L, 2003, 0L),
      (200L, 2001, 1L), (200L, 2002, 0L), (200L, 2003, 0L),
      (300L, 2001, 0L), (300L, 2002, 0L), (300L, 2003, 0L)))
    // first-cell pixel area ≈ (0.5° ≈ 55.6 km)² at the equator
    val areas = rows.map(r => (r.getAs[Long]("HYBAS_ID"), r.getAs[Double]("first_cell_area"))).toMap
    assert(areas(100L) > 3.0e9 && areas(100L) < 3.2e9)
    val bas = rows.map(r => (r.getAs[Long]("HYBAS_ID"), r.getAs[Double]("basin_area"))).toMap
    assert(bas(100L) == 11.1 && bas(200L) == 22.2)
  }
}

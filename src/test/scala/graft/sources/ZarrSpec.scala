package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.zarr.ZarrStore

/** Zarr v2 store tests: the fixture store is written by the INDEPENDENT
  * pure-python spec implementation (tools/zarr_fixture.py); the
  * round-trip test writes with the Scala writer and reads back through
  * the DSv2 source, so both sides of the format are cross-validated.
  */
class ZarrSpec extends SparkSpec {
  import spark.implicits._

  private val store = "/root/repo/data/uparea.zarr"

  private def formula(r: Int, c: Int): Option[Double] =
    if ((r + c) % 11 == 0) None else Some((r * 31 + c * 17) % 997)

  test("metadata + coordinate vectors parse") {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = ZarrStore.readMeta(conf, s"$store/uparea")
    assert(meta.shape == Seq(48, 80) && meta.chunks == Seq(16, 32))
    assert(meta.zlib && meta.fillValue.isNaN)
    val lats = ZarrStore.readVector(conf, s"$store/lat")
    assert(lats.length == 48 && lats(0) == 60.0 && lats(1) == 59.975)
  }

  test("graft-zarr reads the python-written store, dropping NaN fills") {
    val df = spark.read.format("graft-zarr")
      .option("path", store).option("var", "uparea").load()
    assert(df.rdd.getNumPartitions == 9) // one per chunk
    val expectedCells = (for (r <- 0 until 48; c <- 0 until 80;
      v <- formula(r, c)) yield v).size
    assert(df.count() == expectedCells)
    val v = df.filter(col("latitude") === 60.0 - 5 * 0.025 &&
        col("longitude") === 10.0 + 7 * 0.025)
      .select("value").as[Double].head()
    assert(v == formula(5, 7).get)
  }

  test("latitude predicate prunes whole chunk rows at planning") {
    val df = spark.read.format("graft-zarr")
      .option("path", store).option("var", "uparea").load()
    // top chunk row spans lats 60.0 down to 60.0-15*0.025=59.625
    val top = df.filter(col("latitude") >= 59.7)
    assert(top.rdd.getNumPartitions < 9)
    val expected = (for (r <- 0 until 48; c <- 0 until 80;
      v <- formula(r, c); if 60.0 - r * 0.025 >= 59.7) yield v).size
    assert(top.count() == expected)
  }

  test("distributed writeGrid round-trips through the DSv2 reader") {
    val src = spark.read.format("graft-zarr")
      .option("path", store).option("var", "uparea").load()
    val lats = Array.tabulate(48)(i => 60.0 - i * 0.025)
    val lons = Array.tabulate(80)(j => 10.0 + j * 0.025)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_zarr_rt"
    ZarrStore.writeGrid(src.repartition(7), out, "uparea",
      "latitude", "longitude", "value", lats, lons,
      chunkRows = 16, chunkCols = 32)
    val back = spark.read.format("graft-zarr")
      .option("path", out).option("var", "uparea").load()
    val a = src.as[(Double, Double, Double)].collect().toSet
    val b = back.as[(Double, Double, Double)].collect().toSet
    assert(a == b)
    // and the store round-trips the CHUNK layout (9 files)
    assert(back.rdd.getNumPartitions == 9)
  }
}

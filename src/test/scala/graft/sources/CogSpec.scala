package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.tiff.TiffFile

/** Byte-level GeoTIFF fixture tests: fixtures written by the INDEPENDENT
  * pure-python spec implementation (tools/tiff_fixture.py) — agreement
  * cross-validates both sides of the format.
  */
class CogSpec extends SparkSpec {
  import spark.implicits._

  private val tiled = "/root/repo/data/lossyear_tiled.tif"
  private val strips = "/root/repo/data/lossyear_strips.tif"

  private def formula(r: Int, c: Int): Int = (r * 7 + c * 3) % 23

  test("IFD parse: dimensions, layout, georeferencing") {
    val t = TiffFile.info(tiled)
    assert((t.width, t.height, t.bits, t.compression) == (80, 48, 8, 8))
    assert(t.blocks.size == 9) // 3x3 tiles of 32x16 over 80x48
    assert((t.originX, t.originY, t.scaleX, t.scaleY) == (10.0, 60.0, 0.025, 0.025))
    val s = TiffFile.info(strips)
    assert((s.width, s.height, s.compression) == (80, 48, 1))
    assert(s.blocks.size == 3) // 16-row strips
  }

  test("deflate tile decode matches the formula, padding clipped by source") {
    val df = spark.read.format("graft-cog").option("path", tiled).load()
    assert(df.count() == 80 * 48) // padded tile cells never leak
    val v = df.filter(col("x") === 10.0 + 37.5 * 0.025 &&
        col("y") === 60.0 - 21.5 * 0.025)
      .select("value").as[Int].head()
    assert(v == formula(21, 37))
  }

  test("tiled+deflate and striped+uncompressed reads are identical") {
    val a = spark.read.format("graft-cog").option("path", tiled).load()
      .as[(Double, Double, Int)].collect().toSet
    val b = spark.read.format("graft-cog").option("path", strips).load()
      .as[(Double, Double, Int)].collect().toSet
    assert(a == b)
    assert(a.size == 80 * 48)
  }

  test("bbox predicates prune whole tiles at planning") {
    val df = spark.read.format("graft-cog").option("path", tiled).load()
    assert(df.rdd.getNumPartitions == 9)
    // one 32x16 tile's interior (plus pixel slack) → a strict prune
    val box = df.filter(col("x") >= 10.2 && col("x") <= 10.5 &&
      col("y") >= 59.8 && col("y") <= 59.9)
    assert(box.rdd.getNumPartitions < 9)
    // and the residual filter keeps the row set exact
    val expected = (for {
      r <- 0 until 48; c <- 0 until 80
      x = 10.0 + (c + 0.5) * 0.025; y = 60.0 - (r + 0.5) * 0.025
      if x >= 10.2 && x <= 10.5 && y >= 59.8 && y <= 59.9
    } yield (x, y)).size
    assert(box.count() == expected)
  }

  test("nodata option drops the sentinel at the scan (P20 source-side)") {
    val df = spark.read.format("graft-cog").option("path", tiled)
      .option("nodata", "0").load()
    val zeros = (for (r <- 0 until 48; c <- 0 until 80
      if formula(r, c) == 0) yield 1).size
    assert(df.count() == 80 * 48 - zeros)
    assert(df.filter(col("value") === 0).count() == 0)
  }
}

package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.tiff.{TiffFile, TiffWriter}

/** GeoTIFF SINK tests: the Scala writer emits a tiled deflate COG that
  * the byte-level reader (TiffFile), the graft-cog DSv2 source and an
  * independent python IFD parse (run offline, see FIXTURES.md) read
  * back bit-exactly, including padded edge tiles and absent (all-
  * nodata) tiles.
  */
class TiffWriterSpec extends SparkSpec {
  import spark.implicits._

  // 50x40 image with 32x32 tiles: 2x2 tile grid, right/bottom padding
  private val W = 50
  private val H = 40
  private val (ox, oy, sx, sy) = (500000.0, 7000000.0, 30.0, 30.0)
  private def formula(c: Int, r: Int): Int =
    if ((c + r) % 9 == 0) 0 else (c * 13 + r * 7) % 997 + 1

  private lazy val written: String = {
    val px = for {
      r <- 0 until H; c <- 0 until W; v = formula(c, r); if v != 0
    } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, v)
    val df = px.toDF("x", "y", "value").repartition(5)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_rt.tif"
    TiffWriter.writeGrid(df, out, "x", "y", "value",
      ox, oy, sx, sy, W, H, tileW = 32, tileH = 32, bits = 16)
    out
  }

  test("written IFD parses: dims, tiling, deflate, georeferencing") {
    val info = TiffFile.info(written)
    assert(info.width == W && info.height == H)
    assert(info.bits == 16 && info.compression == 8)
    assert(info.originX == ox && info.originY == oy)
    assert(info.scaleX == sx && info.scaleY == sy)
    assert(info.blocks.size == 4) // 2x2 tiles of 32x32
    assert(info.blocks.forall(b => b.width == 32 && b.height == 32))
  }

  test("tile blocks decode to the written samples, nodata elsewhere") {
    val info = TiffFile.info(written)
    for (b <- info.blocks) {
      val samples = TiffFile.readBlock(written, info, b)
      for (lr <- 0 until b.height; lc <- 0 until b.width) {
        val (c, r) = (b.colLo + lc, b.rowLo + lr)
        val expected = if (c < W && r < H) formula(c, r) else 0
        assert(samples(lr * b.width + lc) == expected, s"($c,$r)")
      }
    }
  }

  test("DSv2 graft-cog round-trips, dropping the nodata sentinel") {
    val back = spark.read.format("graft-cog")
      .option("path", written).option("nodata", "0").load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)]
      .collect().toSet
    val expected = (for {
      r <- 0 until H; c <- 0 until W; v = formula(c, r); if v != 0
    } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, v)).toSet
    assert(back == expected)
  }

  test("seeded randomized geometries round-trip exactly") {
    val rnd = new scala.util.Random(20260812L)
    for (case_ <- 1 to 6) {
      val w = 1 + rnd.nextInt(70)
      val h = 1 + rnd.nextInt(50)
      val bits = Seq(8, 16, 32)(rnd.nextInt(3))
      val maxV = if (bits == 8) 255 else 65535
      val px = for {
        r <- 0 until h; c <- 0 until w
        if rnd.nextDouble() > 0.3
      } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, 1 + rnd.nextInt(maxV))
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_rnd.tif"
      TiffWriter.writeGrid(px.toDF("x", "y", "value"), out, "x", "y", "value",
        ox, oy, sx, sy, w, h, tileW = 16, tileH = 16, bits = bits)
      val back = spark.read.format("graft-cog")
        .option("path", out).option("nodata", "0").load()
        .select($"x", $"y", $"value").as[(Double, Double, Int)]
        .collect().toSet
      assert(back == px.toSet, s"case $case_ (${w}x$h bits=$bits)")
    }
  }

  test("tiles with no pixels are written as all-nodata, not holes") {
    // only two pixels, in opposite corner tiles of a 3x2 tile grid
    val df = Seq(
      (ox + 0.5 * sx, oy - 0.5 * sy, 7),
      (ox + (95 + 0.5) * sx, oy - (40 + 0.5) * sy, 9))
      .toDF("x", "y", "value")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_sparse.tif"
    TiffWriter.writeGrid(df, out, "x", "y", "value",
      ox, oy, sx, sy, 96, 48, tileW = 32, tileH = 32, bits = 8)
    val info = TiffFile.info(out)
    assert(info.blocks.size == 6)
    val mid = TiffFile.readBlock(out, info, info.blocks(1)) // untouched tile
    assert(mid.forall(_ == 0))
    val back = spark.read.format("graft-cog")
      .option("path", out).option("nodata", "0").load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)].collect().toSet
    assert(back == Set(
      (ox + 0.5 * sx, oy - 0.5 * sy, 7),
      (ox + 95.5 * sx, oy - 40.5 * sy, 9)))
  }

  test("BigTIFF layout (magic 43, LONG8 arrays) round-trips") {
    val px = for {
      r <- 0 until H; c <- 0 until W; v = formula(c, r); if v != 0
    } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, v)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_big.tif"
    TiffWriter.writeGrid(px.toDF("x", "y", "value"), out, "x", "y", "value",
      ox, oy, sx, sy, W, H, tileW = 32, tileH = 32, bits = 16,
      forceBigTiff = true)
    // header carries the BigTIFF magic
    val headBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out))
    assert(headBytes(2) == 43 && headBytes(3) == 0)
    val info = TiffFile.info(out)
    assert(info.width == W && info.blocks.size == 4)
    val back = spark.read.format("graft-cog")
      .option("path", out).option("nodata", "0").load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)]
      .collect().toSet
    assert(back == px.toSet)
  }

  test("32-bit samples and single-tile inline offsets round-trip") {
    val df = Seq((ox + 0.5 * sx, oy - 0.5 * sy, 1000000),
      (ox + 1.5 * sx, oy - 2.5 * sy, 77))
      .toDF("x", "y", "value")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_one.tif"
    TiffWriter.writeGrid(df, out, "x", "y", "value",
      ox, oy, sx, sy, 16, 16, tileW = 16, tileH = 16, bits = 32)
    val info = TiffFile.info(out)
    assert(info.blocks.size == 1)
    val back = spark.read.format("graft-cog")
      .option("path", out).option("nodata", "0").load()
      .select($"value").as[Int].collect().toSet
    assert(back == Set(1000000, 77))
  }
}

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

  // ------ COG overviews (reduced-resolution IFD chain) ------

  private lazy val writtenOv: String = {
    val px = for {
      r <- 0 until H; c <- 0 until W; v = formula(c, r); if v != 0
    } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, v)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_ov.tif"
    TiffWriter.writeGrid(px.toDF("x", "y", "value").repartition(5), out,
      "x", "y", "value", ox, oy, sx, sy, W, H, tileW = 32, tileH = 32,
      bits = 16, overviews = Seq(2, 4))
    out
  }

  /** Independent expected overview: half-up rounded mean of present
    * (non-nodata) base pixels per f×f block, nodata where empty.
    */
  private def ovExpected(f: Int): Map[(Int, Int), Int] = {
    val (ow, oh) = ((W + f - 1) / f, (H + f - 1) / f)
    (for { rr <- 0 until oh; cc <- 0 until ow } yield {
      val vals = for {
        r <- rr * f until math.min((rr + 1) * f, H)
        c <- cc * f until math.min((cc + 1) * f, W)
        v = formula(c, r) if v != 0
      } yield v.toLong
      (cc, rr) -> (if (vals.isEmpty) 0
        else ((2 * vals.sum + vals.length) / (2 * vals.length)).toInt)
    }).toMap
  }

  test("overview chain parses: dims, derived scale, NewSubfileType") {
    val lv = TiffFile.levels(writtenOv)
    assert(lv.size == 3)
    assert(lv(0).width == W && lv(0).height == H && lv(0).scaleX == sx)
    assert(lv(1).width == 25 && lv(1).height == 20)
    // overview IFDs carry no geo tags; scale derives from the size ratio
    assert(lv(1).scaleX == 2 * sx && lv(1).scaleY == 2 * sy)
    assert(lv(1).originX == ox && lv(1).originY == oy)
    assert(lv(2).width == 13 && lv(2).height == 10 && lv(2).scaleX == 4 * sx)
    assert(lv(2).blocks.size == 1) // inline single-tile arrays at level 2
    // the no-overview layout is untouched: one IFD, chain ends
    assert(TiffFile.levels(written).size == 1)
  }

  test("overview pixels are the rounded mean of present base pixels") {
    val lv = TiffFile.levels(writtenOv)
    for ((f, lvl) <- Seq(2 -> 1, 4 -> 2)) {
      val info = lv(lvl)
      val exp = ovExpected(f)
      for (b <- info.blocks) {
        val samples = TiffFile.readBlock(writtenOv, info, b)
        for (lr <- 0 until b.height; lc <- 0 until b.width) {
          val (c, r) = (b.colLo + lc, b.rowLo + lr)
          val expected =
            if (c < info.width && r < info.height) exp((c, r)) else 0
          assert(samples(lr * b.width + lc) == expected, s"f=$f ($c,$r)")
        }
      }
    }
  }

  test("DSv2 level option reads an overview; out-of-range fails loudly") {
    val back = spark.read.format("graft-cog")
      .option("path", writtenOv).option("nodata", "0").option("level", "1")
      .load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)]
      .collect().toSet
    val exp = ovExpected(2).collect { case ((c, r), v) if v != 0 =>
      (ox + (c + 0.5) * (2 * sx), oy - (r + 0.5) * (2 * sy), v)
    }.toSet
    assert(back == exp)
    val e = intercept[Exception] {
      spark.read.format("graft-cog")
        .option("path", writtenOv).option("level", "7").load().collect()
    }
    assert(e.getMessage.contains("level 7 out of range"))
  }

  test("independent python IFD walk validates the overview chain") {
    import scala.sys.process._
    val script = new java.io.File("tools/tiff_overview_check.py").getAbsolutePath
    val sb = new StringBuilder
    val code = Seq("python3", script, writtenOv, "0")
      .!(ProcessLogger(s => sb.append(s).append('\n'), s => sb.append(s).append('\n')))
    assert(code == 0 && sb.toString.contains("OK levels=3"), sb.toString)
  }

  test("BigTIFF with overviews round-trips and passes the python walk") {
    val px = for {
      r <- 0 until H; c <- 0 until W; v = formula(c, r); if v != 0
    } yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, v)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_big_ov.tif"
    TiffWriter.writeGrid(px.toDF("x", "y", "value"), out, "x", "y", "value",
      ox, oy, sx, sy, W, H, tileW = 32, tileH = 32, bits = 16,
      forceBigTiff = true, overviews = Seq(2))
    val back = spark.read.format("graft-cog")
      .option("path", out).option("nodata", "0").option("level", "1").load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)]
      .collect().toSet
    val exp = ovExpected(2).collect { case ((c, r), v) if v != 0 =>
      (ox + (c + 0.5) * (2 * sx), oy - (r + 0.5) * (2 * sy), v)
    }.toSet
    assert(back == exp)
    import scala.sys.process._
    val script = new java.io.File("tools/tiff_overview_check.py").getAbsolutePath
    assert(Seq("python3", script, out, "0").! == 0)
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

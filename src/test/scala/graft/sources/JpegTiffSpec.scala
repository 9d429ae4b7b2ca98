package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.tiff.{JpegCodec, TiffFile, TiffWriter}

/** JPEG-compressed tiled TIFF (compression 7) — the reference's
  * serving-pyramid codec (`gdal_retile -co COMPRESS=JPEG`,
  * postprocessing.py:69), closed in round 16. Three layers of evidence:
  *
  *  1. codec: the in-engine spec encoder's streams decode EXACTLY via
  *     the JDK's independent baseline decoder on 8×8-uniform content at
  *     quality 100 (the all-ones-quant DC-only regime the MJPEG
  *     fixtures established), and within a tight bound on arbitrary
  *     content (only DCT/IDCT float-rounding separates them there);
  *  2. sink: TiffWriter(compression="jpeg") → TiffFile/graft-cog
  *     round-trips block-uniform grids bit-exactly, padded edge tiles
  *     and absent tiles included;
  *  3. independence: a pure-python stdlib IFD walker + minimal T.81
  *     Huffman decoder (tools/jpeg_tile_check.py, no shared code)
  *     re-derives every pixel from the file bytes alone.
  */
class JpegTiffSpec extends SparkSpec {
  import spark.implicits._

  // 48x40 image, 32x32 tiles: 2x2 tile grid with right/bottom padding;
  // every 8x8 block uniform (the exact-JPEG regime), block (bc, br)
  // carries (bc*37 + br*101) % 255 + 1 — never the nodata 0
  private val W = 48
  private val H = 40
  private val (ox, oy, sx, sy) = (100000.0, 900000.0, 10.0, 10.0)
  private def blockVal(bc: Int, br: Int): Int = (bc * 37 + br * 101) % 255 + 1
  private def formula(c: Int, r: Int): Int = blockVal(c / 8, r / 8)

  private lazy val written: String = {
    val px = for (r <- 0 until H; c <- 0 until W)
      yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, formula(c, r))
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_jpeg.tif"
    TiffWriter.writeGrid(px.toDF("x", "y", "value").repartition(4), out,
      "x", "y", "value", ox, oy, sx, sy, W, H,
      tileW = 32, tileH = 32, bits = 8, compression = "jpeg")
    out
  }

  test("uniform-block streams decode exactly at quality 100") {
    val px = Array.tabulate(16 * 24)(i => blockVal((i % 16) / 8, (i / 16) / 8))
    val (w, h, back) = JpegCodec.decodeGray(
      JpegCodec.encodeGray(px, 16, 24, quality = 100))
    assert(w == 16 && h == 24)
    assert(back.sameElements(px))
  }

  test("arbitrary content at quality 100 is within DCT rounding (<=1/px)") {
    // all-ones quant: the ONLY loss is fDCT/IDCT float rounding — the
    // reconstruction must sit within 1 grey level everywhere
    val px = Array.tabulate(32 * 32)(i =>
      ((i * 2654435761L >>> 16) & 0xFF).toInt)
    val (_, _, back) = JpegCodec.decodeGray(
      JpegCodec.encodeGray(px, 32, 32, quality = 100))
    val maxErr = px.indices.map(i => math.abs(px(i) - back(i))).max
    assert(maxErr <= 1, s"max reconstruction error $maxErr")
  }

  test("lossy quality still produces valid, deterministic streams") {
    // genuinely smooth gradient (no 255→0 wrap discontinuities): the
    // K.1 table at quality 75 keeps low-frequency content tight
    val px = Array.tabulate(16 * 16)(i => 40 + (i % 16) * 2 + (i / 16) * 3)
    val b1 = JpegCodec.encodeGray(px, 16, 16, quality = 75)
    val b2 = JpegCodec.encodeGray(px, 16, 16, quality = 75)
    assert(b1.sameElements(b2))
    val (_, _, back) = JpegCodec.decodeGray(b1)
    val maxErr = px.indices.map(i => math.abs(px(i) - back(i))).max
    assert(maxErr <= 16, s"max error $maxErr at quality 75")
  }

  test("written IFD parses with compression 7 and georeferencing") {
    val info = TiffFile.info(written)
    assert(info.width == W && info.height == H)
    assert(info.bits == 8 && info.compression == 7)
    assert(info.originX == ox && info.originY == oy)
    assert(info.blocks.size == 4)
  }

  test("jpeg tiles decode to the written samples, nodata padding intact") {
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

  test("DSv2 graft-cog round-trips the jpeg COG exactly") {
    val back = spark.read.format("graft-cog")
      .option("path", written).option("nodata", "0").load()
      .select($"x", $"y", $"value").as[(Double, Double, Int)]
      .collect().toSet
    val exp = (for (r <- 0 until H; c <- 0 until W)
      yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, formula(c, r))).toSet
    assert(back == exp)
  }

  test("jpeg overview pyramid: reduced levels are jpeg tiles too") {
    // 2x mean overview of 8x8-uniform blocks pools 4x4 quadrants of one
    // block -> still uniform per 4x4... but overview blocks are 8x8 of
    // MIXED parents, so quality-100 exactness does NOT apply; this test
    // pins STRUCTURE (compression 7 at every level + dims) and decodes
    // without error
    val px = for (r <- 0 until H; c <- 0 until W)
      yield (ox + (c + 0.5) * sx, oy - (r + 0.5) * sy, formula(c, r))
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_cog_jpeg_ov.tif"
    TiffWriter.writeGrid(px.toDF("x", "y", "value"), out,
      "x", "y", "value", ox, oy, sx, sy, W, H,
      tileW = 32, tileH = 32, bits = 8, compression = "jpeg",
      overviews = Seq(2))
    var (info, off) = (TiffFile.info(out), 0)
    assert(info.compression == 7 && info.width == W)
    val lvl1 = spark.read.format("graft-cog")
      .option("path", out).option("level", "1").load()
    assert(lvl1.count() == ((W + 1) / 2) * ((H + 1) / 2))
  }

  test("GDAL-style shared JPEGTables (tag 347) tiles splice and decode") {
    // fixture written by the independent pure-python layout
    // implementation (tools/jpeg_tables_fixture.py): DQT/DHT live in
    // the tag, tiles are abbreviated streams
    val info = TiffFile.info("/root/repo/data/jpeg_tables.tif")
    assert(info.compression == 7 && info.jpegTables != null)
    assert(info.jpegTables.length == 285)
    for (b <- info.blocks) {
      val samples = TiffFile.readBlock("/root/repo/data/jpeg_tables.tif",
        info, b)
      for (lr <- 0 until b.height; lc <- 0 until b.width) {
        val (c, r) = (b.colLo + lc, b.rowLo + lr)
        val expected = ((c / 8) * 29 + (r / 8) * 53) % 255 + 1
        assert(samples(lr * b.width + lc) == expected, s"($c,$r)")
      }
    }
  }

  test("independent python walker re-derives every pixel from the bytes") {
    import scala.sys.process._
    val script = new java.io.File("tools/jpeg_tile_check.py").getAbsolutePath
    val sb = new StringBuilder
    val code = Seq("python3", script, written)
      .!(ProcessLogger(s => sb.append(s).append('\n'),
        s => sb.append(s).append('\n')))
    val expSum = (for (r <- 0 until H; c <- 0 until W)
      yield formula(c, r).toLong).sum
    assert(code == 0 && sb.toString.contains(s"OK tiles=4 pixsum=$expSum"),
      sb.toString)
  }

  test("header-truncated jpeg tile bytes fail loudly, never hang") {
    // cuts inside the marker headers make ImageIO.read return null or
    // throw — either way decodeGray raises. (Cuts inside the ENTROPY
    // segment are tolerated by the JDK decoder — it completes with the
    // bits it has — so wrong-bytes corruption there surfaces as a value
    // mismatch in the hash gates, not an exception; the TIFF byteCount
    // from the IFD is what bounds the read.)
    val px = Array.tabulate(16 * 16)(i => blockVal((i % 16) / 8, (i / 16) / 8))
    val full = JpegCodec.encodeGray(px, 16, 16, quality = 100)
    for (cut <- Seq(2, 40, 120)) {
      val e = intercept[Exception] {
        JpegCodec.decodeGray(java.util.Arrays.copyOf(full, cut))
      }
      assert(e.getMessage != null, s"cut at $cut")
    }
  }

  test("jpeg + non-8-bit is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      TiffWriter.writeGrid(Seq((ox + 5.0, oy - 5.0, 1)).toDF("x", "y", "value"),
        "/tmp/never.tif", "x", "y", "value", ox, oy, sx, sy, 16, 16,
        tileW = 16, tileH = 16, bits = 16, compression = "jpeg")
    }
    assert(e.getMessage.contains("8-bit"))
  }
}

package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Truncation fuzzing of the byte-level format parsers: every strict
  * prefix of a valid file must either parse to a strictly smaller valid
  * result or fail LOUDLY (any exception) — never hang, loop, or return
  * silently wrong data. This is the property that matters for object
  * stores, where truncated uploads are a routine failure mode. Each
  * parser call runs under a watchdog so a non-advancing walk fails the
  * suite instead of wedging it.
  */
class TruncationFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260813L)

  /** Run `body`, treating any exception as a PASS (loud failure); fail
    * the test only on a hang (watchdog) — the property under test is
    * "no hang, no garbage", not "no error".
    */
  private def loudOrFine(tag: String)(body: => Unit): Unit = {
    val t = new Thread(() => try body catch { case _: Throwable => () })
    t.setDaemon(true)
    t.start()
    t.join(30000)
    assert(!t.isAlive, s"$tag: parser hung on truncated input")
  }

  private def prefixes(path: String, n: Int): Seq[Array[Byte]] = {
    val full = Files.readAllBytes(Paths.get(path))
    // always include the pathological tiny prefixes plus random cuts
    val cuts = Seq(0, 1, 4, 8, 16) ++ Seq.fill(n)(rnd.nextInt(full.length))
    cuts.distinct.filter(_ < full.length)
      .map(c => java.util.Arrays.copyOfRange(full, 0, c))
  }

  private def withTemp(bytes: Array[Byte])(f: String => Unit): Unit = {
    val p = Files.createTempFile("graft-fuzz", ".bin")
    try { Files.write(p, bytes); f(p.toString) }
    finally Files.deleteIfExists(p)
  }

  test("GRIB2 parser never hangs on truncated messages") {
    for (b <- prefixes("/root/repo/data/ens_complex.grib2", 12))
      withTemp(b) { p =>
        loudOrFine(s"grib len=${b.length}") {
          graft.sources.grib.Grib2File.index(p).foreach(
            graft.sources.grib.Grib2File.read(p, _))
        }
      }
  }

  test("HDF5 parser never hangs on truncated files") {
    // use a writer-produced .nc (23x40, 3 chunks) as the donor
    val donor = s"${System.getProperty("java.io.tmpdir")}/graft_fuzz_donor.nc"
    import spark.implicits._
    val lats = Array.tabulate(23)(i => 50.0 - i * 0.25)
    val lons = Array.tabulate(40)(j => -10.0 + j * 0.25)
    val cells = for (i <- 0 until 23; j <- 0 until 40 if (i + j) % 3 != 0)
      yield (lats(i), lons(j), (i * 13 + j) % 97 * 0.25f)
    graft.sources.nc.Hdf5Writer.writeGrid(
      cells.toDF("latitude", "longitude", "value"), donor, "v",
      "latitude", "longitude", "value", lats, lons, chunkRows = 10)
    for (b <- prefixes(donor, 12))
      withTemp(b) { p =>
        loudOrFine(s"hdf5 len=${b.length}") {
          val f = new graft.sources.nc.Hdf5File(p)
          try f.readRowBand("v", 0, 23) finally f.close()
        }
      }
  }

  test("TIFF parser never hangs on truncated files") {
    for (donor <- Seq("/root/repo/data/lossyear_tiled.tif",
        "/root/repo/data/lossyear_big.tif"))
      for (b <- prefixes(donor, 10))
        withTemp(b) { p =>
          loudOrFine(s"tiff len=${b.length}") {
            val info = graft.sources.tiff.TiffFile.info(p)
            info.blocks.foreach(
              graft.sources.tiff.TiffFile.readBlock(p, info, _))
          }
        }
  }

  test("WAV/AVI decoders never hang on truncated payloads") {
    import org.apache.spark.sql.functions._
    for (donor <- Seq("/root/repo/data/wav/clip_1.wav",
        "/root/repo/data/avi/clip_1.avi",
        "/root/repo/data/avi_mjpg/clip_1.avi")) {
      val isWav = donor.endsWith(".wav")
      for (b <- prefixes(donor, 8) if b.length >= 12) {
        loudOrFine(s"$donor len=${b.length}") {
          import spark.implicits._
          val df = Seq((1L, b)).toDF("media_id", "payload")
          if (isWav) graft.operators.Multimodal.decodeWav(df).collect()
          else graft.operators.Multimodal.decodeAviFrames(df).collect()
        }
      }
    }
  }

  test("shapefile parser never hangs on truncated files") {
    val locs = graft.sources.shp.Shapefile.index("/root/repo/data/basins.shx")
    for (b <- prefixes("/root/repo/data/basins.shp", 8))
      withTemp(b) { p =>
        loudOrFine(s"shp len=${b.length}") {
          graft.sources.shp.Shapefile.readRange(p, locs, 0, locs.length, None)
        }
      }
    // and a truncated INDEX must fail loudly too
    for (b <- prefixes("/root/repo/data/basins.shx", 6))
      withTemp(b) { p =>
        loudOrFine(s"shx len=${b.length}") {
          graft.sources.shp.Shapefile.index(p)
        }
      }
  }
}

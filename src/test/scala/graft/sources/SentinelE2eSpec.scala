package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.HttpFetch.RetryPolicy

/** The WHOLE raw_ingest.py:24 contract end to end against a fixture
  * server (r19 verdict item 5 — the pieces were spec-proven
  * individually; this composes them the way E2eFloodSpec composes the
  * flood chain): catalog search over a paged window → cloud/tie mosaic
  * selection → bulk download through the resumable manifest WITH a
  * crash mid-batch and an exactly-once resume → parse the downloaded
  * product rasters → last-source-wins mosaic + overlapping retile (the
  * q149 preprocess_retile shape, sentinel/preprocessing.py:109-129) →
  * COG sink + DSv2 read-back, every pixel checked against the driver-
  * computed closed form.
  */
class SentinelE2eSpec extends SparkSpec {

  private val fast = RetryPolicy(maxRetries = 2, delayMs = 5L, linear = true)

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try f(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def tmpDir(name: String): java.io.File = {
    val d = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir")),
      s"graft_sent_e2e_$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(d); d.mkdirs(); d
  }

  // product raster: a 16×16 byte grid, v(x, y) = ((7x + 13y + seed) % 250) + 1
  private val W = 16
  private def pixel(seed: Int, x: Int, y: Int): Int =
    (7 * x + 13 * y + seed) % 250 + 1
  private def productBytes(seed: Int): Array[Byte] =
    Array.tabulate(W * W)(i => pixel(seed, i % W, i / W).toByte)

  test("search → mosaic → crash-resumed download → retile → COG round-trips") {
    withServer { (server, port) =>
      val dlCounts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
      @volatile var healed = false
      val base = s"http://127.0.0.1:$port"
      // Q2/2023 window; timestamped dates (incl. one ON the last day —
      // the r20 prefix-compare fix must keep it); per-tile winners are
      // closed-form: T1 → p1 (lowest in-window cloud; p2 is outside the
      // window), T2 → p4 (cloud tie with p5, latest date wins)
      server.createContext("/catalog", ex => {
        val q = ex.getRequestURI.getQuery
        val page = q.split("&").find(_.startsWith("page="))
          .map(_.drop(5).toInt).getOrElse(1)
        val body = page match {
          case 1 => s"""{"products": [
            {"id": "p1", "tile": "T1", "date": "2023-05-01T08:00:00Z", "cloud_cover": 5.0, "url": "$base/dl/p1"},
            {"id": "p2", "tile": "T1", "date": "2023-07-01T00:00:01Z", "cloud_cover": 1.0, "url": "$base/dl/p2"},
            {"id": "p3", "tile": "T1", "date": "2023-04-10T12:00:00Z", "cloud_cover": 12.0, "url": "$base/dl/p3"}
          ]}"""
          case 2 => s"""{"products": [
            {"id": "p4", "tile": "T2", "date": "2023-06-30T23:59:59Z", "cloud_cover": 3.0, "url": "$base/dl/p4"},
            {"id": "p5", "tile": "T2", "date": "2023-06-01T00:00:00Z", "cloud_cover": 3.0, "url": "$base/dl/p5"}
          ]}"""
          case _ => """{"products": []}"""
        }
        respond(ex, 200, body.getBytes("UTF-8"))
      })
      val seeds = Map("p1" -> 17, "p4" -> 29)
      server.createContext("/dl", ex => {
        val id = ex.getRequestURI.getPath.split('/').last
        dlCounts.computeIfAbsent(id, _ => new AtomicInteger).incrementAndGet()
        if (id == "p4" && !healed) respond(ex, 503, Array.empty)
        else respond(ex, 200, productBytes(seeds(id)))
      })
      val d = tmpDir("run")
      def run() = SentinelCatalog.findProducts(spark,
        s"$base/catalog", "4.0,51.0,5.0,52.0",
        year = 2023, quartile = 2,
        destDir = d.getAbsolutePath, manifestPath = s"$d/manifest",
        policy = fast)

      // ---- 1. first run CRASHES mid-batch (p4 exhausts retries) ----
      intercept[java.io.IOException](run())
      assert(dlCounts.get("p1").get() == 1, "p1 downloaded exactly once")
      // p1 is durably recorded; p4 has no completed object on disk
      assert(new java.io.File(d, "p1.zip").exists())
      assert(!new java.io.File(d, "p4.zip").exists())

      // ---- 2. heal + resume: exactly-once per product ----
      healed = true
      val (selected, fetched) = run()
      assert(selected.map(_.id) == Seq("p1", "p4"), selected.toString)
      val byDest = fetched.map(r => r.dest.split('/').last -> r.skipped).toMap
      assert(byDest("p1.zip") && !byDest("p4.zip"), byDest.toString)
      assert(dlCounts.get("p1").get() == 1, "resume re-downloaded p1")
      // a third run touches the network for the catalog only
      val (_, fetched3) = run()
      assert(fetched3.forall(_.skipped))
      assert(dlCounts.get("p1").get() == 1 && dlCounts.get("p4").get() >= 2)

      // ---- 3. parse products → cells; T2 offset 8 east of T1 so the
      // mosaics overlap on gx in [8, 16) where the LATER source wins ----
      val offsets = Map("p1" -> 0, "p4" -> 8) // gx origin per tile
      val srcIdx = Map("p1" -> 0, "p4" -> 1) // VRT order: T2 later
      val rows = selected.flatMap { p =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(d.getAbsolutePath, s"${p.id}.zip"))
        assert(bytes.length == W * W, s"${p.id}: ${bytes.length} bytes")
        for (y <- 0 until W; x <- 0 until W) yield
          (srcIdx(p.id), offsets(p.id) + x, y, (bytes(y * W + x) & 0xff).toLong)
      }
      import spark.implicits._
      val cells = rows.toDF("s", "gx", "gy", "v")
      val mosaic = cells.groupBy("gx", "gy")
        .agg(max_by(col("v"), col("s")).as("v"))

      // driver closed form of the mosaic
      def expected(gx: Int, gy: Int): Int =
        if (gx >= 8) pixel(29, gx - 8, gy) else pixel(17, gx, gy)
      val got = mosaic.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got.size == 24 * W)
      for (gx <- 0 until 24; gy <- 0 until W)
        assert(got((gx, gy)) == expected(gx, gy).toLong, s"($gx,$gy)")

      // ---- 4. overlapping retile (tile 8, overlap 2, stride 6 — the
      // q149 interval-membership fan-out) with a driver replay ----
      val retiled = mosaic
        .withColumn("tile_x",
          explode(expr("sequence(greatest((gx - 2) div 6, 0), gx div 6)")))
        .withColumn("tile_y",
          explode(expr("sequence(greatest((gy - 2) div 6, 0), gy div 6)")))
        .groupBy("tile_x", "tile_y")
        .agg(count(lit(1)).as("n_cells"), sum("v").as("sum_v"))
        .collect() // `div` yields LONG tile keys
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
          (r.getLong(2), r.getLong(3)))
        .toMap
      val replay = scala.collection.mutable.Map
        .empty[(Int, Int), (Long, Long)].withDefaultValue((0L, 0L))
      for (gx <- 0 until 24; gy <- 0 until W;
           tx <- math.max((gx - 2) / 6, 0) to gx / 6;
           ty <- math.max((gy - 2) / 6, 0) to gy / 6) {
        val (n, sm) = replay((tx, ty))
        replay((tx, ty)) = (n + 1, sm + expected(gx, gy))
      }
      assert(retiled == replay.toMap, "retile stats diverge from replay")

      // ---- 5. COG sink + DSv2 read-back, pixel-exact ----
      val (ox, oy, sx, sy) = (100000.0, 5000000.0, 10.0, 10.0)
      val grid = mosaic.select(
        (lit(ox) + (col("gx") + 0.5) * sx).as("x"),
        (lit(oy) - (col("gy") + 0.5) * sy).as("y"),
        col("v").as("value"))
      val cog = new java.io.File(d, "mosaic.tif").getAbsolutePath
      graft.sources.tiff.TiffWriter.writeGrid(grid, cog, "x", "y", "value",
        ox, oy, sx, sy, width = 24, height = W,
        tileW = 16, tileH = 16, bits = 16)
      val back = spark.read.format("graft-cog")
        .option("path", cog).option("nodata", "0").load()
        .select(col("x"), col("y"), col("value").cast("long").as("v"))
        .collect()
      assert(back.length == 24 * W)
      back.foreach { r =>
        val gx = ((r.getDouble(0) - ox) / sx - 0.5).round.toInt
        val gy = ((oy - r.getDouble(1)) / sy - 0.5).round.toInt
        assert(r.getLong(2) == expected(gx, gy).toLong,
          s"COG pixel ($gx,$gy)")
      }
    }
  }
}

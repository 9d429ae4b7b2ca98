package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sources.HttpFetch.RetryPolicy

/** SentinelCatalog against an in-JVM product-catalog fixture server
  * (the CdsJobsSpec pattern): quartile windowing, cloud-cover
  * filtering, per-tile mosaic selection, paged search, and the
  * resumable bulk download — the engine twin of the reference's
  * `findProducts` → `getAreaMosaics` → `downloadAll` chain
  * (copernicus_resource.py:34-38).
  */
class SentinelCatalogSpec extends SparkSpec {

  private val fast = RetryPolicy(maxRetries = 2, delayMs = 10L)

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try f(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def tmpDir(name: String): java.io.File = {
    val d = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir")),
      s"graft_sentinel_$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(d); d.mkdirs(); d
  }

  test("quartile ranges are the four calendar quarters") {
    assert(SentinelCatalog.quartileRange(2023, 1) == ("2023-01-01", "2023-03-31"))
    assert(SentinelCatalog.quartileRange(2023, 2) == ("2023-04-01", "2023-06-30"))
    assert(SentinelCatalog.quartileRange(2023, 3) == ("2023-07-01", "2023-09-30"))
    assert(SentinelCatalog.quartileRange(2024, 4) == ("2024-10-01", "2024-12-31"))
    intercept[IllegalArgumentException](SentinelCatalog.quartileRange(2023, 5))
  }

  test("mosaic selection: cloud range filter + min-cloud per tile, deterministic ties") {
    import SentinelCatalog.Product
    val ps = Seq(
      Product("a", "T1", "2023-04-10", 30.0, "u/a"),
      Product("b", "T1", "2023-05-01", 10.0, "u/b"),
      Product("c", "T1", "2023-04-20", 10.0, "u/c"), // ties b on cloud; b later
      Product("d", "T2", "2023-04-02", 55.0, "u/d"),
      Product("e", "T2", "2023-06-30", 80.0, "u/e"))
    val all = SentinelCatalog.selectMosaic(ps)
    assert(all.map(p => (p.tile, p.id)) == Seq(("T1", "b"), ("T2", "d")))
    // a narrower cloudCoverage drops whole products before selection
    val clear = SentinelCatalog.selectMosaic(ps, cloudCoverage = (0.0, 20.0))
    assert(clear.map(_.id) == Seq("b"))
    // tie on cloud AND date -> smallest id
    val tied = SentinelCatalog.selectMosaic(Seq(
      Product("z", "T3", "2023-04-01", 5.0, "u/z"),
      Product("y", "T3", "2023-04-01", 5.0, "u/y")))
    assert(tied.map(_.id) == Seq("y"))
  }

  test("findProducts: paged search, windowing, mosaic, exactly-once download") {
    withServer { (server, port) =>
      val searches = new AtomicInteger(0)
      val downloads = new AtomicInteger(0)
      // page 1: two tiles, one out-of-window date, one high-cloud;
      // page 2: a better (lower-cloud) T2 product; page 3: empty
      server.createContext("/catalog", ex => {
        searches.incrementAndGet()
        val q = ex.getRequestURI.getQuery
        assert(q.contains("from=2023-04-01") && q.contains("to=2023-06-30"),
          s"bad window in query: $q")
        val page = q.split("&").find(_.startsWith("page="))
          .map(_.drop(5).toInt).getOrElse(1)
        val base = s"http://127.0.0.1:$port"
        val body = page match {
          case 1 => s"""{"products": [
            {"id": "p1", "tile": "T31UDQ", "date": "2023-04-15", "cloud_cover": 12.5, "url": "$base/dl/p1"},
            {"id": "p2", "tile": "T31UDQ", "date": "2023-05-20", "cloud_cover": 3.0, "url": "$base/dl/p2"},
            {"id": "p3", "tile": "T31UDQ", "date": "2023-07-02", "cloud_cover": 0.5, "url": "$base/dl/p3"},
            {"id": "p4", "tile": "T31UEQ", "date": "2023-06-01", "cloud_cover": 44.0, "url": "$base/dl/p4"}
          ]}"""
          case 2 => s"""{"products": [
            {"id": "p5", "tile": "T31UEQ", "date": "2023-04-03", "cloud_cover": 9.0, "url": "$base/dl/p5"}
          ]}"""
          case _ => """{"products": []}"""
        }
        respond(ex, 200, body)
      })
      server.createContext("/dl", ex => {
        downloads.incrementAndGet()
        val id = ex.getRequestURI.getPath.split('/').last
        val payload = s"product-bytes-$id".getBytes("UTF-8")
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      })
      val d = tmpDir("find")
      val (selected, fetched) = SentinelCatalog.findProducts(spark,
        s"http://127.0.0.1:$port/catalog", "4.0,51.0,5.0,52.0",
        year = 2023, quartile = 2,
        destDir = d.getAbsolutePath, manifestPath = s"$d/manifest",
        policy = fast)
      // p3 is outside Q2 (would have won T31UDQ on cloud) — windowing
      // must drop it; p2 wins T31UDQ, p5 wins T31UEQ
      assert(selected.map(_.id) == Seq("p2", "p5"), selected.toString)
      assert(searches.get() == 3) // two data pages + the empty page
      assert(fetched.map(_.skipped) == Seq(false, false))
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$d/p2.zip"))) == "product-bytes-p2")
      // re-run: catalog re-queried, downloads SKIPPED via the manifest
      val dlBefore = downloads.get()
      val (_, fetched2) = SentinelCatalog.findProducts(spark,
        s"http://127.0.0.1:$port/catalog", "4.0,51.0,5.0,52.0",
        year = 2023, quartile = 2,
        destDir = d.getAbsolutePath, manifestPath = s"$d/manifest",
        policy = fast)
      assert(fetched2.forall(_.skipped) && downloads.get() == dlBefore)
    }
  }

  test("timestamped ISO dates survive the defense-in-depth window " +
      "(last day of the quartile is not lexically excluded)") {
    withServer { (server, port) =>
      server.createContext("/catalog", ex => {
        val q = ex.getRequestURI.getQuery
        val page = q.split("&").find(_.startsWith("page="))
          .map(_.drop(5).toInt).getOrElse(1)
        val base = s"http://127.0.0.1:$port"
        // timestamped dates: t1 sits ON the window's last day (must be
        // kept — a bare lexical compare against "2023-06-30" drops it);
        // t2 is genuinely outside (July) and must still be dropped.
        val body =
          if (page == 1) s"""{"products": [
            {"id": "t1", "tile": "T31UDQ", "date": "2023-06-30T10:00:00Z", "cloud_cover": 1.0, "url": "$base/dl/t1"},
            {"id": "t2", "tile": "T31UDQ", "date": "2023-07-01T00:00:01Z", "cloud_cover": 0.1, "url": "$base/dl/t2"}
          ]}"""
          else """{"products": []}"""
        respond(ex, 200, body)
      })
      server.createContext("/dl", ex => {
        val payload = "b".getBytes("UTF-8")
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      })
      val d = tmpDir("tsdate")
      val (selected, _) = SentinelCatalog.findProducts(spark,
        s"http://127.0.0.1:$port/catalog", "4.0,51.0,5.0,52.0",
        year = 2023, quartile = 2,
        destDir = d.getAbsolutePath, manifestPath = s"$d/manifest",
        policy = fast)
      assert(selected.map(_.id) == Seq("t1"), selected.toString)
    }
  }
}

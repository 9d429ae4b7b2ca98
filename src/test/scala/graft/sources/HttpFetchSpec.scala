package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec

import graft.sources.HttpFetch.RetryPolicy

/** HttpFetch against an in-JVM HTTP server: success, retry-on-5xx with
  * eventual success (linear backoff — the reference policy shape,
  * jobs.py:9-21), no-retry-on-404, exhaustion, the auth-header seam,
  * and the resumable fetchAll manifest (each object downloaded exactly
  * once across a crash + re-run).
  */
class HttpFetchSpec extends SparkSpec {

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try f(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_httpfetch_$name"

  test("downloads a payload to a Hadoop FS destination") {
    withServer { (server, port) =>
      val payload = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
      server.createContext("/data.bin", ex => {
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      })
      val dest = tmp("ok.bin")
      val n = HttpFetch.download(spark, s"http://127.0.0.1:$port/data.bin", dest)
      assert(n == payload.length)
      val got = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dest))
      assert(got.toSeq == payload.toSeq)
    }
  }

  test("retries 5xx with backoff and succeeds when the server recovers") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/flaky", ex => {
        if (calls.incrementAndGet() < 3) {
          ex.sendResponseHeaders(503, -1)
          ex.close()
        } else {
          val body = "ok".getBytes
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
        }
      })
      val t0 = System.nanoTime()
      val n = HttpFetch.download(spark, s"http://127.0.0.1:$port/flaky",
        tmp("flaky.bin"), RetryPolicy(maxRetries = 2, delayMs = 40))
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(n == 2 && calls.get() == 3)
      // linear backoff: retry 1 waits 1*40, retry 2 waits 2*40 — 120 ms
      // minimum total (the reference's k*delay rule at test scale)
      assert(elapsedMs >= 120, s"linear backoff not honored: $elapsedMs ms")
    }
  }

  test("404 fails immediately without retry") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/missing", ex => {
        calls.incrementAndGet()
        ex.sendResponseHeaders(404, -1)
        ex.close()
      })
      intercept[java.io.FileNotFoundException] {
        HttpFetch.download(spark, s"http://127.0.0.1:$port/missing",
          tmp("missing.bin"), RetryPolicy(maxRetries = 2, delayMs = 10))
      }
      assert(calls.get() == 1)
    }
  }

  test("exhausted retries surface the last error") {
    withServer { (server, port) =>
      server.createContext("/down", ex => {
        ex.sendResponseHeaders(500, -1)
        ex.close()
      })
      val e = intercept[java.io.IOException] {
        HttpFetch.download(spark, s"http://127.0.0.1:$port/down",
          tmp("down.bin"), RetryPolicy(maxRetries = 1, delayMs = 10))
      }
      assert(e.getMessage.contains("after 2 attempts"))
      // no truncated dest and no leftover .part where a reader could
      // scan them
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp("down.bin"))))
    }
  }

  test("the reference policy constant matches jobs.py:9-21") {
    val p = HttpFetch.ReferencePolicy
    assert(p.maxRetries == 5 && p.delayMs == 500000L && p.linear)
    // last retry at 5*500 s cumulative wait from the linear schedule:
    assert((1 to 5).map(p.waitBeforeRetry).sum == 7500000L)
  }

  test("auth seam: request headers reach the server") {
    withServer { (server, port) =>
      @volatile var seen: String = null
      server.createContext("/auth", ex => {
        seen = ex.getRequestHeaders.getFirst("Authorization")
        val body = "ok".getBytes
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      })
      HttpFetch.download(spark, s"http://127.0.0.1:$port/auth",
        tmp("auth.bin"), RetryPolicy(maxRetries = 0, delayMs = 0),
        headers = Map("Authorization" -> "Bearer sekrit-123"))
      assert(seen == "Bearer sekrit-123")
    }
  }

  test("fetchAll resumes from the manifest: each object exactly once") {
    withServer { (server, port) =>
      val calls = scala.collection.mutable.Map.empty[String, AtomicInteger]
      def ctx(name: String, body: String, failFirst: Int): Unit = {
        val c = new AtomicInteger(0)
        calls(name) = c
        server.createContext(s"/$name", ex => {
          if (c.incrementAndGet() <= failFirst) {
            ex.sendResponseHeaders(503, -1); ex.close()
          } else {
            val b = body.getBytes
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
            ex.close()
          }
        })
      }
      ctx("a", "alpha", failFirst = 0)
      ctx("b", "bravo-bytes", failFirst = 3) // exhausts a 2-retry policy
      ctx("c", "charlie", failFirst = 0)
      val base = s"http://127.0.0.1:$port"
      val manifest = tmp("manifest.tsv")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(manifest))
      // a previous RUN's torn .tmp fixture (the double-crash test below)
      // must not leak in: live-missing + torn-.tmp is a state production
      // can never reach, but deleting only the live file above creates it
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(manifest + ".tmp"))
      val items = Seq(
        (s"$base/a", tmp("obj_a.bin")),
        (s"$base/b", tmp("obj_b.bin")),
        (s"$base/c", tmp("obj_c.bin")))
      val pol = RetryPolicy(maxRetries = 2, delayMs = 5)
      // run 1: a succeeds, b exhausts retries -> the job dies mid-flight
      intercept[java.io.IOException] {
        HttpFetch.fetchAll(spark, items, manifest, pol)
      }
      assert(calls("a").get() == 1 && calls("b").get() == 3 &&
        calls("c").get() == 0)
      // run 2 ("after the server recovered"): a is SKIPPED from the
      // manifest — zero network calls — b and c download
      val results = HttpFetch.fetchAll(spark, items, manifest, pol)
      assert(calls("a").get() == 1, "resumed run re-downloaded object a")
      assert(results.map(r => (r.skipped, r.bytes)) ==
        Seq((true, 5L), (false, 11L), (false, 7L)))
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(tmp("obj_b.bin"))).toSeq ==
        "bravo-bytes".getBytes.toSeq)
      // run 3: everything skipped, zero network traffic
      val totals = calls.map { case (k, v) => k -> v.get() }.toMap
      val r3 = HttpFetch.fetchAll(spark, items, manifest, pol)
      assert(r3.forall(_.skipped))
      assert(calls.map { case (k, v) => k -> v.get() }.toMap == totals)

      // crash INSIDE the manifest swap (the r17 advice window): the
      // live manifest was deleted but the rename never ran — only the
      // complete .tmp exists. The next run must recover it and still
      // skip everything with zero network calls.
      java.nio.file.Files.move(
        java.nio.file.Paths.get(manifest),
        java.nio.file.Paths.get(manifest + ".tmp"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val r4 = HttpFetch.fetchAll(spark, items, manifest, pol)
      assert(r4.forall(_.skipped))
      assert(calls.map { case (k, v) => k -> v.get() }.toMap == totals)
      // r18 advice window: recovery must PROMOTE the .tmp to the live
      // path (not just read it), so a SECOND crash mid-write of a new
      // .tmp can never truncate the only surviving copy.
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(manifest)),
        "recovery did not promote .tmp to the live manifest")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(manifest + ".tmp")))
      // simulate that second crash: a torn .tmp next to the intact live
      // manifest — the next run must read the live file and stay clean
      java.nio.file.Files.write(
        java.nio.file.Paths.get(manifest + ".tmp"),
        "torn-partial-lin".getBytes)
      val r5 = HttpFetch.fetchAll(spark, items, manifest, pol)
      assert(r5.forall(_.skipped))
      assert(calls.map { case (k, v) => k -> v.get() }.toMap == totals)
    }
  }
}

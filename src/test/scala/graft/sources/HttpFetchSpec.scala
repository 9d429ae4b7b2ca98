package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec

/** HttpFetch against an in-JVM HTTP server: success, retry-on-5xx with
  * eventual success, no-retry-on-404, and exhaustion.
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
      val n = HttpFetch.download(spark, s"http://127.0.0.1:$port/flaky",
        tmp("flaky.bin"), maxAttempts = 3, backoffMs = 10)
      assert(n == 2 && calls.get() == 3)
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
          tmp("missing.bin"), maxAttempts = 3, backoffMs = 10)
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
          tmp("down.bin"), maxAttempts = 2, backoffMs = 10)
      }
      assert(e.getMessage.contains("after 2 attempts"))
    }
  }
}

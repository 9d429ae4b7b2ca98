package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sources.HttpFetch.RetryPolicy

/** CdsJobs against an in-JVM async-job server (the cdsapi protocol the
  * reference's GloFAS resource drives, glofas_resource.py:26-27):
  * submit → poll (queued → running → completed) → retrieve, with the
  * exactly-once resume contract proven across a crash mid-poll and a
  * crash mid-download — the submission counter never passes 1 per
  * request, and a completed item re-runs with zero network calls.
  * Plus the Copernicus login-exchange seam (copernicus_resource
  * .py:34-38): credentialed login → Bearer token → authorized fetch,
  * with the secret provably absent from every manifest byte.
  */
class CdsJobsSpec extends SparkSpec {

  private val fast = RetryPolicy(maxRetries = 5, delayMs = 10L, linear = true)

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
      s"graft_cds_$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(d); d.mkdirs(); d
  }

  /** A one-job CDS fixture: POST /req submits (counted), GET /status
    * walks queued → running → completed, GET /result serves the payload
    * (optionally failing the first `resultFailures` attempts with 503).
    */
  private def cdsServer(server: HttpServer, submits: AtomicInteger,
      requests: AtomicInteger, payload: Array[Byte],
      pollsUntilDone: Int = 2, resultFailures: Int = 0): Unit = {
    val polls = new AtomicInteger(0)
    val resultFails = new AtomicInteger(0)
    server.createContext("/req", ex => {
      requests.incrementAndGet()
      if (ex.getRequestMethod == "POST") {
        submits.incrementAndGet()
        respond(ex, 200,
          """{"state": "queued", "request_id": "job-1", "location": "/status"}""")
      } else respond(ex, 405, "")
    })
    server.createContext("/status", ex => {
      requests.incrementAndGet()
      val k = polls.incrementAndGet()
      if (k <= pollsUntilDone)
        respond(ex, 200,
          s"""{"state": "${if (k == 1) "queued" else "running"}"}""")
      else respond(ex, 200,
        """{"state": "completed", "location": "/result"}""")
    })
    server.createContext("/result", ex => {
      requests.incrementAndGet()
      if (resultFails.incrementAndGet() <= resultFailures) respond(ex, 503, "")
      else {
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
        ex.close()
      }
    })
  }

  test("submit -> poll -> retrieve happy path, manifests settle") {
    withServer { (server, port) =>
      val submits = new AtomicInteger(0)
      val requests = new AtomicInteger(0)
      val payload = Array.tabulate[Byte](5000)(i => (i % 13).toByte)
      cdsServer(server, submits, requests, payload, pollsUntilDone = 2)
      val d = tmpDir("happy")
      val mp = s"$d/manifest"
      val dest = s"$d/out.grib"
      val r = CdsJobs.retrieveAll(spark,
        Seq((s"http://127.0.0.1:$port/req", """{"variable": "dis24"}""", dest)),
        mp, fast, pollDelayMs = 5L)
      assert(r.head.bytes == 5000 && !r.head.skipped && r.head.polls == 3)
      assert(submits.get() == 1)
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest)).toSeq == payload.toSeq)
      // job manifest emptied, data manifest records the completion
      val jobs = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$mp.jobs")))
      assert(jobs.trim.isEmpty)
      // completed item re-runs with ZERO network calls
      val before = requests.get()
      val r2 = CdsJobs.retrieveAll(spark,
        Seq((s"http://127.0.0.1:$port/req", """{"variable": "dis24"}""", dest)),
        mp, fast, pollDelayMs = 5L)
      assert(r2.head.skipped && requests.get() == before)
    }
  }

  test("crash mid-poll resumes the SAME job — no re-submit") {
    withServer { (server, port) =>
      val submits = new AtomicInteger(0)
      val requests = new AtomicInteger(0)
      val payload = "result-bytes".getBytes
      cdsServer(server, submits, requests, payload, pollsUntilDone = 3)
      val d = tmpDir("midpoll")
      val mp = s"$d/manifest"
      val dest = s"$d/out.grib"
      val item = Seq((s"http://127.0.0.1:$port/req", "{}", dest))
      // "crash" while the job is still queued: maxPolls = 1 throws after
      // the submit was durably recorded
      intercept[java.io.IOException] {
        CdsJobs.retrieveAll(spark, item, mp, fast, maxPolls = 1, pollDelayMs = 5L)
      }
      assert(submits.get() == 1)
      // resume: polls the recorded job to completion, never re-submits
      val r = CdsJobs.retrieveAll(spark, item, mp, fast, pollDelayMs = 5L)
      assert(!r.head.skipped && r.head.bytes == payload.length)
      assert(submits.get() == 1)
    }
  }

  test("crash mid-download resumes without re-submitting") {
    withServer { (server, port) =>
      val submits = new AtomicInteger(0)
      val requests = new AtomicInteger(0)
      val payload = "late-bytes".getBytes
      // the result endpoint fails more times than the download's retry
      // budget on the first run, then recovers
      cdsServer(server, submits, requests, payload, pollsUntilDone = 0,
        resultFailures = 7)
      val d = tmpDir("middl")
      val mp = s"$d/manifest"
      val dest = s"$d/out.grib"
      val item = Seq((s"http://127.0.0.1:$port/req", "{}", dest))
      intercept[java.io.IOException] {
        CdsJobs.retrieveAll(spark, item, mp,
          RetryPolicy(maxRetries = 2, delayMs = 5L), pollDelayMs = 5L)
      }
      assert(submits.get() == 1)
      // no truncated object is visible at dest
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dest)))
      val r = CdsJobs.retrieveAll(spark, item, mp, fast, pollDelayMs = 5L)
      assert(!r.head.skipped && r.head.bytes == payload.length)
      assert(submits.get() == 1)
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dest)).toSeq == payload.toSeq)
    }
  }

  test("failed job state raises immediately; 5xx submit retries") {
    withServer { (server, port) =>
      val submitCalls = new AtomicInteger(0)
      server.createContext("/req", ex => {
        // first submit attempt 503s — the control retry must recover
        if (submitCalls.incrementAndGet() == 1) respond(ex, 503, "")
        else respond(ex, 200, """{"state": "queued", "location": "/status"}""")
      })
      server.createContext("/status", ex =>
        respond(ex, 200, """{"state": "failed", "message": "no data"}"""))
      val d = tmpDir("failed")
      val e = intercept[java.io.IOException] {
        CdsJobs.retrieveAll(spark,
          Seq((s"http://127.0.0.1:$port/req", "{}", s"$d/x")), s"$d/m", fast,
          pollDelayMs = 5L)
      }
      assert(e.getMessage.contains("no data"))
      assert(submitCalls.get() == 2) // 503 then success
    }
  }

  test("jsonField applies the full RFC 8259 string unescape") {
    // \\ must decode BEFORE \" (a naive replace chain mis-reads the
    // sequence backslash-backslash-backslash-quote). Triple-quoted
    // Scala literals keep backslashes raw, so the JSON below contains
    // the exact wire bytes.
    assert(CdsJobs.jsonField("""{"location": "a\\b"}""", "location") == "a\\b")
    assert(CdsJobs.jsonField("""{"location": "q\\\"r"}""", "location")
      == "q\\\"r") // decodes to backslash + quote
    assert(CdsJobs.jsonUnescape("""a\\b\"c\/d\n\t""") == "a\\b\"c/d\n\t")
    assert(CdsJobs.jsonUnescape("plain-no-escapes") == "plain-no-escapes")
    // \uXXXX escapes decode — an escaped result URL resolves correctly
    // ("\\" + "u002F..." builds the literal because the Scala scanner
    // would otherwise process \u even inside triple quotes)
    assert(CdsJobs.jsonUnescape("\\" + "u002Fresult") == "/result")
    assert(CdsJobs.jsonField(
      """{"state": "completed", "location": "/result"}""",
      "location") == "/result")
  }

  test("job-manifest .tmp is promoted at recovery — double-crash safe") {
    withServer { (server, port) =>
      val submits = new AtomicInteger(0)
      val requests = new AtomicInteger(0)
      cdsServer(server, submits, requests, "late".getBytes, pollsUntilDone = 0)
      val d = tmpDir("promote")
      val mp = s"$d/manifest"
      val item = Seq((s"http://127.0.0.1:$port/req", "{}", s"$d/o.bin"))
      // crash after submit (maxPolls=0 throws before any status probe
      // completes the job) — the job manifest has the handle
      intercept[java.io.IOException] {
        CdsJobs.retrieveAll(spark, item, mp, fast, maxPolls = 0,
          pollDelayMs = 5L)
      }
      assert(submits.get() == 1)
      // crash INSIDE the job-manifest swap: live deleted, .tmp complete
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$mp.jobs"),
        java.nio.file.Paths.get(s"$mp.jobs.tmp"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val r = CdsJobs.retrieveAll(spark, item, mp, fast, pollDelayMs = 5L)
      assert(!r.head.skipped && r.head.bytes == 4)
      assert(submits.get() == 1, "recovery re-submitted the job")
      // the promotion happened: no stale .jobs.tmp survives the run
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$mp.jobs.tmp")))
    }
  }

  test("copernicus login exchange: token works, secret never persists") {
    withServer { (server, port) =>
      val secret = "hunter2-super-secret"
      val token = "tok-abc123"
      server.createContext("/login", ex => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (ex.getRequestMethod == "POST" &&
            body.contains("username=alice") &&
            body.contains(s"password=${secret}"))
          respond(ex, 200, s"""{"access_token": "$token", "token_type": "Bearer"}""")
        else respond(ex, 401, """{"error": "bad credentials"}""")
      })
      val payload = "protected-product".getBytes
      server.createContext("/product", ex => {
        if (ex.getRequestHeaders.getFirst("Authorization") == s"Bearer $token") {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload)
          ex.close()
        } else respond(ex, 403, "")
      })
      val d = tmpDir("login")
      val mp = s"$d/manifest"
      // wrong credential: 4xx is fatal, no retry loop
      intercept[java.io.FileNotFoundException] {
        CopernicusAuth.login(s"http://127.0.0.1:$port/login", "alice", "wrong",
          policy = fast)
      }
      val auth = CopernicusAuth.login(
        s"http://127.0.0.1:$port/login", "alice", secret, policy = fast)
      assert(auth("Authorization") == s"Bearer $token")
      val r = HttpFetch.fetchAll(spark,
        Seq((s"http://127.0.0.1:$port/product", s"$d/p.bin")), mp,
        policy = fast, headers = auth)
      assert(r.head.bytes == payload.length)
      // the secret and the token land in NO manifest byte
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(mp)))
      assert(!manifest.contains(secret) && !manifest.contains(token))
    }
  }

  test("pollDelay stays positive and capped past the shift-overflow point") {
    // Reference defaults: 1000 ms base, 60 s cap. The old form
    // (pollDelayMs << (polls-1), capped only by math.min) wrapped
    // negative at polls = 55 (1000·2^54 > 2^63) and Thread.sleep threw
    // at poll #56 — a CDS job queued > ~1 h crashed retrieveAll on
    // every resume.
    val (base, cap) = (1000L, 60000L)
    assert(CdsJobs.pollDelay(1, base, cap) == 1000L)
    assert(CdsJobs.pollDelay(2, base, cap) == 2000L)
    assert(CdsJobs.pollDelay(7, base, cap) == 60000L) // 64 s → cap
    for (polls <- Seq(55, 56, 100, 999, Int.MaxValue)) {
      val d = CdsJobs.pollDelay(polls, base, cap)
      assert(d == cap, s"polls=$polls gave $d")
    }
    // degenerate base = 1 ms: shift alone reaches 63 without the cap
    assert(CdsJobs.pollDelay(64, 1L, Long.MaxValue) == Long.MaxValue)
    assert(CdsJobs.pollDelay(100, 1L, 5000L) == 5000L)
  }
}

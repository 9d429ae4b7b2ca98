package graft.sources

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** CDS-style ASYNC ingest — the submit → poll → retrieve job protocol the
  * reference's GloFAS resource drives through `cdsapi.Client.retrieve`
  * (glofas_resource.py:26-27): a request is POSTed to the dataset
  * endpoint, the service answers with a job handle, the client polls the
  * job's status (queued → running → completed | failed) with backoff,
  * and only then downloads the produced object. This was the one piece
  * of the reference's ingest contract [[HttpFetch]] (plain GET +
  * retry/auth/resume) did not cover.
  *
  * State machine + durability (the exactly-once-resume contract):
  *
  *  - SUBMIT is the only non-idempotent step, so the returned job
  *    handle is recorded in a JOB manifest BEFORE polling begins — a
  *    crash anywhere after submit resumes by polling the SAME job,
  *    never re-submitting (the spec's submission counter proves it).
  *  - POLL is a pure GET loop with the retry policy's backoff between
  *    status probes; `failed` raises immediately (waiting never fixes a
  *    failed job — the cdsapi split).
  *  - RETRIEVE streams through [[HttpFetch.download]] (.part + rename —
  *    no truncated object is ever visible) and records completion in
  *    the DATA manifest; a completed item is skipped on re-run with
  *    ZERO network calls, and its job-manifest entry is dropped.
  *
  * Both manifests use the same crash-recoverable tmp+swap protocol as
  * [[HttpFetch.fetchAll]] (read `.tmp` when the live file is missing —
  * complete by construction). Control responses are the tiny JSON
  * bodies of the CDS protocol; the two fields the state machine needs
  * (`state`, `location`) are extracted with a minimal string scan so no
  * JSON library enters the engine.
  */
object CdsJobs {

  final case class RetrieveResult(requestUrl: String, dest: String,
      bytes: Long, skipped: Boolean, polls: Int)

  /** Extract a top-level string field from a small flat JSON object —
    * enough for the CDS control responses ({"state": "...",
    * "location": "...", "request_id": "..."}). Returns null if absent.
    */
  private[sources] def jsonField(body: String, field: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(field) +
        "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(body)
    if (m.find()) jsonUnescape(m.group(1)) else null
  }

  /** Full JSON string unescape (RFC 8259 §7) — \\ before \" matters
    * (a raw replace chain mis-decodes "\\\"" as backslash + quote),
    * and \uXXXX escapes in a location/message must decode or an
    * escaped result URL would be mis-resolved.
    */
  private[sources] def jsonUnescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 6 <= s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[sources] def httpBody(url: String, method: String, body: Option[String],
      headers: Map[String, String], connectTimeoutMs: Int,
      readTimeoutMs: Int): (Int, String) = {
    var conn: HttpURLConnection = null
    try {
      conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod(method)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(b.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      val code = conn.getResponseCode
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (in == null) "" else try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      (code, text)
    } finally if (conn != null) conn.disconnect()
  }

  /** One retried control call (5xx/IO retried per policy, 4xx fatal). */
  private[sources] def control(url: String, method: String, body: Option[String],
      policy: HttpFetch.RetryPolicy, headers: Map[String, String],
      connectTimeoutMs: Int, readTimeoutMs: Int): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= policy.maxRetries) {
      if (attempt > 0) Thread.sleep(policy.waitBeforeRetry(attempt))
      attempt += 1
      try {
        val (code, text) = httpBody(url, method, body, headers,
          connectTimeoutMs, readTimeoutMs)
        if (code >= 500) sys.error(s"HTTP $code from $url") // retryable
        else if (code >= 400)
          throw new java.io.FileNotFoundException(s"HTTP $code from $url")
        else return text
      } catch {
        case e: java.io.FileNotFoundException => throw e
        case scala.util.control.NonFatal(e) => lastErr = e
      }
    }
    throw new java.io.IOException(
      s"$method $url failed after ${policy.maxRetries + 1} attempts", lastErr)
  }

  /** Submit the async request; returns the job's STATUS URL (the
    * protocol's `location`, resolved against the request URL).
    */
  def submit(requestUrl: String, requestBody: String,
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): String = {
    val text = control(requestUrl, "POST", Some(requestBody), policy,
      headers, connectTimeoutMs, readTimeoutMs)
    val loc = jsonField(text, "location")
    require(loc != null, s"submit response carries no location: $text")
    URI.create(requestUrl).resolve(loc).toString
  }

  /** Poll a job's status URL until `completed`; returns (result URL,
    * polls made). `failed` raises immediately with the job's message;
    * `maxPolls` bounds the loop (a stuck queue must fail loudly, not
    * hang). The poll CADENCE is its own knob (r18 advice: reusing the
    * retry policy's linear failure backoff as the poll interval made
    * the second status probe wait 500 s under the reference policy) —
    * capped exponential: poll k (k >= 2) waits
    * min(pollDelayMs · 2^(k-2), pollMaxDelayMs), the cdsapi client's
    * own shape. `policy` still governs 5xx/IO retries INSIDE each probe.
    */
  /** The wait before poll number `polls+1` (polls >= 1 completed).
    * Capped exponential that stops DOUBLING once the shifted delay
    * reaches the cap: `pollDelayMs << sh` overflows at
    * sh >= nlz(pollDelayMs) (1000 has nlz 54, so 1000 << 54 >= 2^63
    * wraps negative — bit length L + sh <= 63 is the safe region,
    * i.e. sh <= nlz - 1), and the previous
    * `math.min(shifted, cap)` then picked the NEGATIVE value —
    * Thread.sleep threw at poll #56 (~51 min in) on every resume of a
    * long-queued job. Pure so the spec can probe past the overflow point
    * without sleeping.
    */
  def pollDelay(polls: Int, pollDelayMs: Long, pollMaxDelayMs: Long): Long = {
    // pollDelayMs << sh stays positive iff sh < nlz(pollDelayMs)
    // (bit length L + sh <= 63 ⇔ sh <= 63 - L = nlz - 1).
    val sh = polls - 1
    if (sh >= java.lang.Long.numberOfLeadingZeros(pollDelayMs)) pollMaxDelayMs
    else math.min(pollDelayMs << sh, pollMaxDelayMs)
  }

  def poll(statusUrl: String,
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      maxPolls: Int = 1000,
      pollDelayMs: Long = 1000L, pollMaxDelayMs: Long = 60000L,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): (String, Int) = {
    var polls = 0
    while (polls < maxPolls) {
      if (polls > 0) Thread.sleep(pollDelay(polls, pollDelayMs, pollMaxDelayMs))
      polls += 1
      val text = control(statusUrl, "GET", None, policy, headers,
        connectTimeoutMs, readTimeoutMs)
      jsonField(text, "state") match {
        case "completed" =>
          val loc = jsonField(text, "location")
          require(loc != null, s"completed without location: $text")
          return (URI.create(statusUrl).resolve(loc).toString, polls)
        case "failed" =>
          throw new java.io.IOException(
            s"job failed: ${Option(jsonField(text, "message")).getOrElse(text)}")
        case "queued" | "running" | "accepted" => // keep polling
        case other => sys.error(s"unknown job state '$other' in: $text")
      }
    }
    throw new java.io.IOException(s"job not completed after $maxPolls polls")
  }

  // ---- durable manifests (the HttpFetch tmp+swap recovery protocol) ----

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mp: Path): scala.collection.mutable.LinkedHashMap[String, String] = {
    val tmp = new Path(mp.toString + ".tmp")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // live missing + .tmp present = interrupted swap; PROMOTE the .tmp
    // (it is complete by construction — write finishes before the live
    // delete) so the next writeManifest cannot truncate the only copy
    if (!fs.exists(mp) && fs.exists(tmp))
      require(fs.rename(tmp, mp), s"manifest recovery rename failed: $mp")
    val src = if (fs.exists(mp)) Some(mp) else None
    src.foreach { p =>
      val in = fs.open(p)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      text.split('\n').filter(_.nonEmpty).foreach { line =>
        // key is url\tdest (itself tab-joined) — the VALUE is the part
        // after the LAST tab, matching HttpFetch.fetchAll's line format
        val i = line.lastIndexOf('\t')
        require(i > 0, s"corrupt manifest line: $line")
        out(line.substring(0, i)) = line.substring(i + 1)
      }
    }
    out
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, mp: Path,
      entries: scala.collection.Map[String, String]): Unit = {
    val tmp = new Path(mp.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.map { case (k, v) => s"$k\t$v\n" }
      .mkString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(mp, false)
    require(fs.rename(tmp, mp), s"manifest rename failed: $mp")
  }

  /** The full exactly-once state machine over a batch of async
    * requests. `items` are (requestUrl, requestBody, dest) triples;
    * `manifestPath` names the DATA manifest ([[HttpFetch.fetchAll]]'s
    * format) and `manifestPath + ".jobs"` the JOB manifest
    * (key = url·SEP·dest, value = status URL). Resume semantics:
    * completed item → skipped, zero network; submitted-but-undownloaded
    * item → poll the recorded job, never re-submit; unknown item →
    * submit fresh.
    */
  def retrieveAll(spark: SparkSession,
      items: Seq[(String, String, String)], manifestPath: String,
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      maxPolls: Int = 1000,
      pollDelayMs: Long = 1000L, pollMaxDelayMs: Long = 60000L,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 60000): Seq[RetrieveResult] = {
    val fs = new Path(manifestPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataMp = new Path(manifestPath)
    val jobsMp = new Path(manifestPath + ".jobs")
    val done = readManifest(fs, dataMp)
    val jobs = readManifest(fs, jobsMp)
    items.map { case (url, body, dest) =>
      val key = url + "\t" + dest
      done.get(key) match {
        case Some(bytes) =>
          RetrieveResult(url, dest, bytes.toLong, skipped = true, polls = 0)
        case None =>
          val statusUrl = jobs.getOrElse(key, {
            val su = submit(url, body, policy, headers,
              connectTimeoutMs, readTimeoutMs)
            jobs(key) = su
            writeManifest(fs, jobsMp, jobs) // durable BEFORE polling
            su
          })
          val (resultUrl, polls) = poll(statusUrl, policy, headers,
            maxPolls, pollDelayMs, pollMaxDelayMs,
            connectTimeoutMs, readTimeoutMs)
          val n = HttpFetch.download(spark, resultUrl, dest, policy,
            headers, connectTimeoutMs, readTimeoutMs)
          done(key) = n.toString
          writeManifest(fs, dataMp, done)
          jobs.remove(key)
          writeManifest(fs, jobsMp, jobs)
          RetrieveResult(url, dest, n, skipped = false, polls = polls)
      }
    }
  }
}

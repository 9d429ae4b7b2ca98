package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side HTTP ingest (S9): the reference pulls its raw inputs
  * over HTTP before any analytics — `httpx.get` (hydrobasins.py:25-27,
  * upstream.py:22-23), `urlretrieve` (global_forest_watch.py:47-48) —
  * under ONE hard operational contract: op-level
  * `RetryPolicy(max_retries=5, delay=500, backoff=LINEAR)`
  * (jobs.py:9-21 — retry k waits k·500 s, last retry at 7500 s), with
  * authenticated endpoints behind resource objects carrying api keys /
  * credentials (glofas_resource.py:26-27, copernicus_resource.py:34-38).
  *
  * The Spark-side image: stream a URL straight into any Hadoop
  * FileSystem destination (file://, hdfs://, s3a://) so downloads land
  * where the cluster reads without a driver-local staging copy;
  * [[RetryPolicy]] reproduces the reference's linear policy as the
  * default; `headers` is the auth seam (Authorization / api-key headers
  * — what cdsapi/httpx put on the wire); [[fetchAll]] adds the
  * resumable MANIFEST the reference gets from Dagster rematerialization:
  * completed objects are recorded durably, a re-run after a crash
  * downloads each object exactly once.
  */
object HttpFetch {

  /** The reference's op-level retry contract (jobs.py:9-21). Wait
    * before retry k (1-based) = k·delayMs (linear) or delayMs·2^(k-1)
    * (exponential). `maxRetries` counts RETRIES — total attempts =
    * maxRetries + 1, exactly Dagster's semantics.
    */
  final case class RetryPolicy(maxRetries: Int = 5, delayMs: Long = 500000L,
      linear: Boolean = true) {
    require(maxRetries >= 0 && delayMs >= 0, s"bad policy: $this")
    def waitBeforeRetry(k: Int): Long =
      if (linear) k * delayMs else delayMs << (k - 1)
  }

  /** The reference's exact numbers: 5 retries, 500 s base, linear —
    * last retry fires 7500 s after the first attempt.
    */
  val ReferencePolicy: RetryPolicy = RetryPolicy()

  final case class FetchResult(url: String, dest: String, bytes: Long,
      skipped: Boolean)

  /** Download `url` to `dest` (any Hadoop FS path). IO errors and 5xx
    * are retried per `policy`; 4xx fail immediately (a bad credential
    * or missing object never recovers by waiting — same split cdsapi
    * makes). The body streams to `dest + ".part"` and RENAMES on
    * completion, so an interrupted run can never leave a truncated
    * object where a reader might scan it. Returns the byte count.
    */
  def download(spark: SparkSession, url: String, dest: String,
      policy: RetryPolicy = ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): Long = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= policy.maxRetries) {
      if (attempt > 0) Thread.sleep(policy.waitBeforeRetry(attempt))
      attempt += 1
      var conn: HttpURLConnection = null
      try {
        conn = URI.create(url).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val code = conn.getResponseCode
        if (code >= 500) sys.error(s"HTTP $code from $url") // retryable
        else if (code >= 400)
          throw new java.io.FileNotFoundException(s"HTTP $code from $url")
        val part = dest + ".part"
        val n = copyToFs(spark, conn.getInputStream, part)
        val fs = new Path(dest)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new Path(dest), false)
        require(fs.rename(new Path(part), new Path(dest)),
          s"rename $part -> $dest failed")
        return n
      } catch {
        case e: java.io.FileNotFoundException => throw e // 4xx: don't retry
        case scala.util.control.NonFatal(e) => lastErr = e
      } finally if (conn != null) conn.disconnect()
    }
    throw new java.io.IOException(
      s"download of $url failed after ${policy.maxRetries + 1} attempts",
      lastErr)
  }

  /** Resumable multi-object fetch: download every (url, dest) pair,
    * recording each completion in a MANIFEST file (tab-separated
    * `url dest bytes` lines at `manifestPath`, rewritten via
    * tmp+swap after every object; a crash anywhere in the swap is
    * recovered on the next run — see the recovery rule below). A re-run
    * with the same manifest
    * SKIPS recorded objects without touching the network — the
    * exactly-once resume contract a crashed multi-hour ingest needs
    * (the reference leans on Dagster's asset rematerialization for
    * this; engine-side it must be explicit). Objects are fetched in
    * order; the first failure propagates after the manifest has
    * recorded everything already completed, so progress is never lost.
    */
  def fetchAll(spark: SparkSession, items: Seq[(String, String)],
      manifestPath: String,
      policy: RetryPolicy = ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 60000): Seq[FetchResult] = {
    val fs = new Path(manifestPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val mp = new Path(manifestPath)
    val tmp = new Path(manifestPath + ".tmp")
    // Recovery rule (closes the delete→rename crash window the r17
    // advice flagged): writeManifest only deletes the live manifest
    // AFTER the .tmp is fully written and closed, so if the live file
    // is missing the .tmp is by construction a COMPLETE manifest from
    // the interrupted swap — PROMOTE it (rename .tmp -> live, finishing
    // the interrupted swap) before reading, so the next writeManifest's
    // create(tmp, overwrite) can never truncate the only surviving
    // copy (the r18 advice's second-crash window). A torn .tmp can only
    // coexist with an intact live manifest (write happens first), never
    // with a missing one, so the promotion is always safe.
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
        val f = line.split('\t')
        require(f.length == 3, s"corrupt manifest line: $line")
        done(f(0) + "\t" + f(1)) = f(2).toLong
      }
    }
    def writeManifest(): Unit = {
      val out = fs.create(tmp, true)
      try out.write(done.map { case (k, v) => s"$k\t$v\n" }
        .mkString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(mp, false)
      require(fs.rename(tmp, mp), s"manifest rename failed: $manifestPath")
    }
    items.map { case (url, dest) =>
      val key = url + "\t" + dest
      done.get(key) match {
        case Some(bytes) => FetchResult(url, dest, bytes, skipped = true)
        case None =>
          val n = download(spark, url, dest, policy, headers,
            connectTimeoutMs, readTimeoutMs)
          done(key) = n
          writeManifest()
          FetchResult(url, dest, n, skipped = false)
      }
    }
  }

  private def copyToFs(spark: SparkSession, in: InputStream, dest: String): Long = {
    val fs = new Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dest), true)
    try {
      val buf = new Array[Byte](256 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); total += n; n = in.read(buf) }
      total
    } finally { out.close(); in.close() }
  }
}

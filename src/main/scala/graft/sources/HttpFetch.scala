package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side HTTP ingest (S9): the reference pulls its raw inputs
  * over HTTP before any analytics — `httpx.get` (hydrobasins.py:25-27,
  * upstream.py:22-23), `urlretrieve` (global_forest_watch.py:47-48) —
  * and SURVEY §2.1 scopes this as ingest code, not an engine operator.
  * This is the Spark-side image: stream a URL straight into any Hadoop
  * FileSystem destination (file://, hdfs://, s3a://) with bounded
  * retry + exponential backoff, so downloads land where the cluster
  * reads without a driver-local staging copy.
  */
object HttpFetch {

  /** Download `url` to `dest` (any Hadoop FS path). Retries
    * `maxAttempts-1` times on IO errors / 5xx with exponential backoff
    * starting at `backoffMs`. Returns the byte count.
    */
  def download(spark: SparkSession, url: String, dest: String,
      maxAttempts: Int = 3, backoffMs: Long = 250,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): Long = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) Thread.sleep(backoffMs << (attempt - 1))
      attempt += 1
      var conn: HttpURLConnection = null
      try {
        conn = URI.create(url).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        val code = conn.getResponseCode
        if (code >= 500) sys.error(s"HTTP $code from $url") // retryable
        else if (code >= 400)
          throw new java.io.FileNotFoundException(s"HTTP $code from $url")
        return copyToFs(spark, conn.getInputStream, dest)
      } catch {
        case e: java.io.FileNotFoundException => throw e // 4xx: don't retry
        case scala.util.control.NonFatal(e) => lastErr = e
      } finally if (conn != null) conn.disconnect()
    }
    throw new java.io.IOException(
      s"download of $url failed after $maxAttempts attempts", lastErr)
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

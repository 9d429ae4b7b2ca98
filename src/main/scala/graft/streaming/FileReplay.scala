package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic micro-batch REPLAY harness: stages a bounded event
  * table as time-ordered parquet files so a file-source stream consumes
  * it one time-range per trigger — the event-time watermark then only
  * ever advances, which makes watermark-dependent operators (windowed
  * aggregation, EventTimeTimeout sessionization) produce exactly the
  * batch answer. Two far-future "flush" sentinel rows advance the
  * watermark past every real timeout/window and then fire them in a
  * guaranteed data batch (no reliance on no-data micro-batches). Used
  * by the streaming correctness-gate queries (q83, q87); results filter
  * `event_type != 'flush'` / `user_id >= 0` to drop the sentinels.
  */
object FileReplay {

  /** Stage `sel` — (event_id long, ts timestamp, user_id long,
    * event_type string, value double/decimal) — into `srcDir` as
    * `nBuckets` equal event-time ranges plus two sentinel files, with
    * strictly increasing modification times (the file source's oldest-
    * first order). Idempotent: clears `srcDir` first.
    */
  def stageEventReplay(sel: DataFrame, srcDir: java.io.File,
      nBuckets: Int = 5, nSentinels: Int = 2): Unit = {
    val s = sel.sparkSession
    if (srcDir.exists()) srcDir.listFiles().foreach(_.delete())
    srcDir.mkdirs()
    val stage = new java.io.File(srcDir.getParentFile,
      srcDir.getName + "_stage").getAbsolutePath

    val bounds = sel
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / nBuckets + 1

    def stageFile(df: DataFrame, k: Int): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"b$k%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1704067200000L + k * 1000L)
    }
    for (k <- 0 until nBuckets) {
      val (bLo, bHi) = (lo + k * step, lo + (k + 1) * step)
      stageFile(sel.filter(unix_micros(col("ts")) >= bLo &&
        unix_micros(col("ts")) < bHi), k)
    }
    import s.implicits._
    for (k <- nBuckets until nBuckets + nSentinels) {
      stageFile(Seq((-k.toLong, new java.sql.Timestamp(
          (hi / 1000) + k.toLong * 10 * 86400 * 1000),
        -k.toLong, "flush", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"), k)
    }
  }

  /** Stage an arbitrary bounded table as an ordered replay: `nBuckets`
    * equal ranges of the LONG column `orderCol`, one file per range with
    * strictly increasing modification times. No watermark is involved,
    * so no sentinel rows — the stateful consumer sees arrivals in
    * `orderCol` order across micro-batches (ties land in the same file).
    * Used by the streaming-dedup gate (q156), where arrival order is
    * doc_id order by construction.
    */
  def stageOrderedReplay(sel: DataFrame, orderCol: String,
      srcDir: java.io.File, nBuckets: Int = 5,
      clear: Boolean = true): Unit = {
    // clear = false appends to an already-staged dir (the bootstrap-
    // checkpoint pattern: a sentinel file is staged and consumed before
    // the real replay files land); staged names b00.. never collide
    if (clear && srcDir.exists()) srcDir.listFiles().foreach(_.delete())
    srcDir.mkdirs()
    val stage = new java.io.File(srcDir.getParentFile,
      srcDir.getName + "_stage").getAbsolutePath
    val bounds = sel.agg(min(col(orderCol)), max(col(orderCol))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / nBuckets + 1
    for (k <- 0 until nBuckets) {
      val (bLo, bHi) = (lo + k * step, lo + (k + 1) * step)
      val df = sel.filter(col(orderCol) >= bLo && col(orderCol) < bHi)
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"b$k%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1704067200000L + k * 1000L)
    }
  }

  /** Run a streaming transform of the staged replay to completion and
    * return the memory-sink table. `build` maps the file-source stream
    * (schema = `schema`) to the streaming result.
    */
  def runToTable(s: org.apache.spark.sql.SparkSession,
      srcDir: java.io.File, schema: org.apache.spark.sql.types.StructType,
      queryName: String,
      outputMode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Append())(
      build: DataFrame => DataFrame): DataFrame = {
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val sq = build(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()
    try sq.processAllAvailable() finally sq.stop()
    s.table(queryName)
  }
}

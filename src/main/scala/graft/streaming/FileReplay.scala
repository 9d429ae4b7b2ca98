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

  /** Stage `df` as ONE parquet file named `name` in `srcDir` with a
    * pinned modification time — the staging primitive every replay and
    * bootstrap path shares (write to a sibling `_stage` dir, move the
    * single part file into place, pin mtime so the file source's
    * oldest-first order IS the staged order). Factored once (r20
    * review: three divergent inline copies).
    */
  private[graft] def stageOne(df: DataFrame, srcDir: java.io.File,
      name: String, mtime: Long): Unit = {
    val stage = new java.io.File(srcDir.getParentFile,
      srcDir.getName + "_stage").getAbsolutePath
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(srcDir, name)
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(mtime)
  }

  /** Stage `sel` — (event_id long, ts timestamp, user_id long,
    * event_type string, value double/decimal) — into `srcDir` as
    * `nBuckets` equal event-time ranges plus two sentinel files, with
    * strictly increasing modification times (the file source's oldest-
    * first order). Idempotent: clears `srcDir` first. Sentinel rows are
    * cast to `sel`'s own schema so a decimal-valued selection stages
    * uniformly-typed files (a raw double sentinel mixed physical
    * parquet types with decimal buckets — r20 review).
    */
  def stageEventReplay(sel: DataFrame, srcDir: java.io.File,
      nBuckets: Int = 5, nSentinels: Int = 2): Unit = {
    val s = sel.sparkSession
    if (srcDir.exists()) srcDir.listFiles().foreach(_.delete())
    srcDir.mkdirs()

    val bounds = sel
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    require(!bounds.isNullAt(0),
      "stageEventReplay: empty selection — nothing to stage")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / nBuckets + 1

    for (k <- 0 until nBuckets) {
      val (bLo, bHi) = (lo + k * step, lo + (k + 1) * step)
      stageOne(sel.filter(unix_micros(col("ts")) >= bLo &&
        unix_micros(col("ts")) < bHi), srcDir, f"b$k%02d.parquet",
        1704067200000L + k * 1000L)
    }
    import s.implicits._
    for (k <- nBuckets until nBuckets + nSentinels) {
      val sentinel = Seq((-k.toLong, new java.sql.Timestamp(
          (hi / 1000) + k.toLong * 10 * 86400 * 1000),
        -k.toLong, "flush", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .select(sel.schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      stageOne(sentinel, srcDir, f"b$k%02d.parquet",
        1704067200000L + k * 1000L)
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
    val bounds = sel.agg(min(col(orderCol)), max(col(orderCol))).head()
    require(!bounds.isNullAt(0),
      "stageOrderedReplay: empty selection — nothing to stage")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / nBuckets + 1
    for (k <- 0 until nBuckets) {
      val (bLo, bHi) = (lo + k * step, lo + (k + 1) * step)
      stageOne(sel.filter(col(orderCol) >= bLo && col(orderCol) < bHi),
        srcDir, f"b$k%02d.parquet", 1704067200000L + k * 1000L)
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
    // SPARK_GRAFT_STREAM_DEBUG=1: per-batch duration breakdown + state
    // operator metrics on stderr (guide §1 — measure before theorizing
    // about where a replayed stream's wall goes). Opt-in diagnostics.
    if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
      sq.recentProgress.foreach { p =>
        val d = p.durationMs
        val st = p.stateOperators.headOption.map(o =>
          s" stateRows=${o.numRowsTotal} updated=${o.numRowsUpdated}" +
            s" updMs=${o.allUpdatesTimeMs} commitMs=${o.commitTimeMs}" +
            s" memUsed=${o.memoryUsedBytes}").getOrElse("")
        System.err.println(
          s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
            s"triggerMs=${d.get("triggerExecution")} " +
            s"addBatchMs=${d.get("addBatch")} " +
            s"getBatchMs=${d.get("getBatch")} " +
            s"planMs=${d.get("queryPlanning")}$st")
      }
    s.table(queryName)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STATE LIFECYCLE for continuous-ingest dedup (the r17 verdict item):
  * a long-running [[StreamDedup]] stream's state and checkpoint grow
  * monotonically — every arrival appends a member block, and the
  * checkpoint directory accrues one state version per micro-batch.
  * Production rotation = periodically REBAKE: rebuild the compact batch
  * index from everything indexed so far (corpus ∪ all prior arrivals),
  * bake it into a FRESH checkpoint with a sentinel-only batch (the
  * bootstrap-checkpoint machinery the 3M-doc macro measured at 2.4×),
  * restart the stream from that checkpoint, and delete the old
  * checkpoint tree wholesale.
  *
  * Rotation is SEMANTICS-PRESERVING for every future arrival, provably:
  * a rebake re-flags prior delta members as `corpus = true`, and the
  * state function's match condition `corpus || memberId < arrivalId`
  * evaluates identically under either flag whenever the arrival's id
  * exceeds every indexed id — which ordered replay guarantees (ids are
  * monotone across deltas). StreamRebakeSpec pins verdict equality
  * against the monolithic never-rotated stream, plus the bounded-state
  * claims (fresh checkpoint = ONE committed batch; state rows = the
  * rebaked index's bucket count).
  *
  * The bake MUST run with RocksDB changelog checkpointing OFF: a
  * changelog-mode commit writes the whole index as a changelog and the
  * restart replays every put (measured 786 s aggregate on the 9M-bucket
  * macro); a snapshot-mode bake loads sst files directly. [[withConf]]
  * scopes provider/changelog settings and restores them.
  */
object StateRebake {

  /** WHEN to rotate (r18 verdict item 4): production rotation needs a
    * decision point, not just the mechanism. Thresholds are read from
    * the live query's `lastProgress.stateOperators` — rows (the member
    * blocks accrued), durable bytes (RocksDB sst footprint — the thing
    * that actually grows the checkpoint), and committed batches (the
    * checkpoint's version history length, which bounds recovery replay
    * and file count).
    */
  final case class RebakePolicy(
      maxStateRows: Long = Long.MaxValue,
      maxStateBytes: Long = Long.MaxValue,
      maxCommittedBatches: Long = Long.MaxValue)

  /** Durable state bytes from a progress: prefer the RocksDB sst-file
    * metric (the on-disk footprint a checkpoint snapshot carries); fall
    * back to the provider-agnostic memoryUsedBytes. The probed key is
    * `rocksdbSstFileSize` — the name RocksDBStateStoreProvider actually
    * publishes in Spark 4.1.2 (r20 review find: the previously-probed
    * `rocksdbTotalSstFilesBytes` exists nowhere in the distribution, so
    * the sst branch was dead and a policy sized for sst bytes compared
    * against the ~15× smaller memory figure). StreamRebakeSpec pins the
    * live metric name against a real RocksDB query's progress.
    */
  private[graft] val SstMetric = "rocksdbSstFileSize"
  private[graft] def stateBytes(
      op: org.apache.spark.sql.streaming.StateOperatorProgress): Long = {
    val m = op.customMetrics
    val sst = if (m != null && m.containsKey(SstMetric))
      m.get(SstMetric).longValue() else 0L
    if (sst > 0) sst else op.memoryUsedBytes
  }

  /** Rotation decision from the query's last progress: Some(reason)
    * when any policy threshold is breached, None while healthy (or
    * before the first progress — an empty stream never rotates).
    */
  def shouldRotate(q: StreamingQuery, policy: RebakePolicy): Option[String] = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) return None
    val op = p.stateOperators(0)
    val rows = op.numRowsTotal
    val bytes = stateBytes(op)
    val batches = p.batchId + 1
    if (rows > policy.maxStateRows)
      Some(s"stateRows $rows > ${policy.maxStateRows}")
    else if (bytes > policy.maxStateBytes)
      Some(s"stateBytes $bytes > ${policy.maxStateBytes}")
    else if (batches > policy.maxCommittedBatches)
      Some(s"committedBatches $batches > ${policy.maxCommittedBatches}")
    else None
  }

  /** Delete a superseded checkpoint tree wholesale. Guarded: refuses a
    * directory that does not LOOK like a streaming checkpoint (must
    * contain offsets/ or commits/) — a mis-passed path must never be
    * recursively deleted.
    */
  def deleteCheckpointTree(dir: java.io.File): Unit = {
    require(dir.isDirectory &&
      (new java.io.File(dir, "offsets").exists() ||
        new java.io.File(dir, "commits").exists()),
      s"$dir does not look like a streaming checkpoint; refusing to delete")
    // fail LOUDLY on a partial delete: a silently-surviving 3 GB tree
    // defeats the rotation's whole point (r20 review — File.delete's
    // boolean was ignored and a null listFiles NPE'd opaquely)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) {
        val kids = f.listFiles()
        require(kids != null, s"cannot list $f during checkpoint delete")
        kids.foreach(rm)
      }
      require(f.delete(), s"failed to delete $f (checkpoint tree " +
        "partially removed — rerun after releasing the holder)")
    }
    rm(dir)
  }

  /** Stage a single sentinel document (empty text — produces no band
    * rows, so it triggers a data batch without touching any bucket)
    * into a CLEARED `srcDir`. The real replay files are staged after
    * the bake with `FileReplay.stageOrderedReplay(..., clear = false)`.
    */
  def stageBootstrapSentinel(spark: SparkSession, srcDir: java.io.File): Unit = {
    import spark.implicits._
    if (srcDir.exists()) srcDir.listFiles().foreach(_.delete())
    srcDir.mkdirs()
    // mtime BELOW FileReplay's 1704067200000 base so the sentinel is
    // always the oldest staged file
    FileReplay.stageOne(Seq((Long.MinValue, "")).toDF("doc_id", "text"),
      srcDir, "a_bootstrap.parquet", 1704067100000L)
  }

  /** Run `body` under the RocksDB state-store provider with changelog
    * checkpointing as given; restores both confs after.
    */
  def withConf[A](spark: SparkSession, changelog: Boolean)(body: => A): A = {
    val provKey = EventStreams.ProviderClassConf
    val chgKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProv = spark.conf.getOption(provKey)
    val prevChg = spark.conf.getOption(chgKey)
    spark.conf.set(provKey, EventStreams.RocksDbProvider)
    spark.conf.set(chgKey, changelog.toString)
    try body finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
      prevChg match {
        case Some(p) => spark.conf.set(chgKey, p)
        case None => spark.conf.unset(chgKey)
      }
    }
  }

  /** Idempotent per-batch parquet append for a foreachBatch sink: the
    * batch's rows land as deterministically-named `b<batchId>_<i>`
    * files; a checkpoint REPLAY of the same batch clears that batch's
    * files first and re-lands them, so duplicates cannot survive a
    * crash between the sink write and the commit-log record (r20
    * review: a plain mode("append") write duplicated the replayed
    * batch's verdict rows — foreachBatch is at-least-once by contract,
    * and idempotence is the sink's job). Readers keep the flat
    * single-directory parquet layout.
    */
  def idempotentBatchAppend(outDir: String)(
      df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long): Unit = {
    val out = new java.io.File(outDir)
    out.mkdirs()
    val stage = new java.io.File(out.getParentFile,
      out.getName + s"_stage_b$batchId")
    df.write.mode("overwrite").parquet(stage.getAbsolutePath)
    val parts = stage.listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    out.listFiles().filter(_.getName.startsWith(s"b${batchId}_"))
      .foreach(f => require(f.delete(), s"cannot clear stale $f"))
    parts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.move(p.toPath,
        new java.io.File(out, s"b${batchId}_$i.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    stage.listFiles().foreach(_.delete())
    stage.delete()
  }

  /** The restartable dedup query over a staged replay dir: verdicts
    * append to `outDir` as parquet via foreachBatch (a memory sink
    * cannot recover from a checkpoint — the r16 lesson), through
    * [[idempotentBatchAppend]] so a replayed batch never duplicates
    * rows. `indexDocs`
    * feeds the initialState plan; on a restart from an existing
    * checkpoint the store's own state wins and initialState is skipped,
    * but the frame is still part of the DAG — the caller should hand a
    * cheap (checkpointed) frame.
    */
  def startDedupQuery(spark: SparkSession, srcDir: java.io.File,
      checkpointDir: String, outDir: String, indexDocs: DataFrame,
      threshold: Double = 0.8): StreamingQuery = {
    import spark.implicits._
    val init = StreamDedup.corpusIndexState(indexDocs, "doc_id", "text")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    StreamDedup.dedupStream(
        StreamDedup.bandRows(stream.toDF(), "doc_id", "text"), init,
        threshold)
      .toDF()
      .writeStream
      .foreachBatch(idempotentBatchAppend(outDir) _)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Bake `indexDocs` into a FRESH checkpoint at `checkpointDir` (must
    * not exist yet): snapshot-mode sentinel-only batch 0 commits the
    * whole index. Returns the bake's reported state rows (== the
    * index's distinct bucket count — the bounded-state witness).
    */
  def bakeDedupCheckpoint(spark: SparkSession, indexDocs: DataFrame,
      srcDir: java.io.File, checkpointDir: String, outDir: String,
      threshold: Double = 0.8): Long = {
    stageBootstrapSentinel(spark, srcDir)
    withConf(spark, changelog = false) {
      val q = startDedupQuery(spark, srcDir, checkpointDir, outDir,
        indexDocs, threshold)
      try {
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          p.stateOperators(0).numRowsTotal
        else -1L
      } finally q.stop()
    }
  }
}

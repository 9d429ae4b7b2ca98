package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Exactly-once recovery: a checkpointed file-sink stream is STOPPED
  * mid-run and restarted from its checkpoint; the final sink must hold
  * every source row exactly once — no duplicates from the replayed
  * batch, no losses from the interrupted one. This is the production
  * property the replay gates (q83/q87–q90) don't exercise: they run
  * each stream to completion in one attempt.
  */
class StreamRecoverySpec extends SparkSpec {

  test("file-sink stream resumes from checkpoint with exactly-once output") {
    val sel = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
    val base = Files.createTempDirectory("graft_recovery").toFile
    val srcDir = new java.io.File(base, "src")
    FileReplay.stageEventReplay(sel, srcDir, nBuckets = 6)
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath

    def start() = spark.readStream.schema(sel.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // attempt 1: let SOME batches commit, then stop mid-stream. Any
    // stop point is a valid test — recovery must work from every prefix.
    val sq1 = start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (sq1.recentProgress.map(_.numInputRows).sum < 1 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sq1.recentProgress.nonEmpty, "first attempt never progressed")
    } finally sq1.stop()

    // attempt 2: same checkpoint, same sink — drain the rest
    val sq2 = start()
    try sq2.processAllAvailable() finally sq2.stop()

    val got = spark.read.parquet(outDir)
      .filter(col("event_id") >= 0) // drop the replay flush sentinels
    val want = sel
    assert(got.count() == want.count(),
      s"row count ${got.count()} != source ${want.count()}")
    // exact multiset equality: every event exactly once
    val diff = got.groupBy("event_id").count().filter(col("count") =!= 1).count()
    assert(diff == 0, s"$diff event_ids appear != once after recovery")
    val missing = want.select("event_id")
      .except(got.select("event_id")).count()
    assert(missing == 0, s"$missing source events missing after recovery")
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Recovery property for the transformWithState operator (q172): the
  * composite MapState+ValueState under RocksDB, checkpointed, STOPPED
  * mid-stream and restarted, must close to the exact batch totals — the
  * same closure an uninterrupted run has. This is the property the
  * replay gate doesn't exercise (it runs each stream once to
  * completion), and it pins that the new state layout round-trips
  * through checkpoint restore.
  */
class TransformWithStateRecoverySpec extends SparkSpec {

  test("checkpointed transformWithState restarts to the exact batch totals") {
    val s = spark
    import s.implicits._
    val prev = s.conf.getOption(EventStreams.ProviderClassConf)
    s.conf.set(EventStreams.ProviderClassConf, EventStreams.RocksDbProvider)
    try {
      val sel = Tables.load(s, "/root/testdata/sf0.001", "events")
        .select(col("event_id").cast("long"), col("ts"),
          col("user_id").cast("long"), col("event_type"), col("value"))
      val base = Files.createTempDirectory("graft_tws_rec").toFile
      val srcDir = new java.io.File(base, "src")
      FileReplay.stageEventReplay(sel, srcDir, nBuckets = 6)

      def start(out: String, ckpt: String) = {
        val stream = s.readStream.schema(sel.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.getAbsolutePath)
        EventStreams.typeCountsWithState(stream.as[EventStreams.Event])
          .toDF()
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
      }

      val out1 = new java.io.File(base, "out1").getAbsolutePath
      val ck1 = new java.io.File(base, "ck1").getAbsolutePath
      val sq1 = start(out1, ck1)
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (sq1.recentProgress.map(_.numInputRows).sum < 1 &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(sq1.recentProgress.nonEmpty, "first attempt never progressed")
      } finally sq1.stop()
      val sq2 = start(out1, ck1)
      try sq2.processAllAvailable() finally sq2.stop()

      // uninterrupted reference run (fresh sink + checkpoint)
      val out2 = new java.io.File(base, "out2").getAbsolutePath
      val ck2 = new java.io.File(base, "ck2").getAbsolutePath
      val sqr = start(out2, ck2)
      try sqr.processAllAvailable() finally sqr.stop()

      def finals(path: String) = s.read.parquet(path)
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"),
          max_by(col("n_distinct_types"), col("n_events"))
            .as("n_distinct_types"))
        .as[(Long, Long, Long)].collect().toSet

      val recovered = finals(out1)
      assert(recovered === finals(out2),
        "recovered run diverged from uninterrupted run")

      val batch = sel.filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_distinct_types"))
        .as[(Long, Long, Long)].collect().toSet
      assert(recovered === batch, "recovered run diverged from batch totals")
    } finally {
      prev match {
        case Some(v) => s.conf.set(EventStreams.ProviderClassConf, v)
        case None => s.conf.unset(EventStreams.ProviderClassConf)
      }
    }
  }
}

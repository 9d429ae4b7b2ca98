package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recovery property for the streaming LSH dedup (q156's operator): a
  * checkpointed run STOPPED mid-stream and restarted must produce the
  * exact verdict multiset of an uninterrupted run — i.e. the band-bucket
  * state (including the corpus initial state, which Spark only reads on
  * the FIRST run and thereafter restores from the checkpoint) survives
  * restart, no arrival is verdicted twice or lost.
  */
class StreamDedupRecoverySpec extends SparkSpec {

  private val corpusTxt =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def uniq(i: Long) =
    s"u$i one$i two$i three$i four$i five$i six$i seven$i eight$i nine$i ten$i eleven$i"

  test("checkpointed stream dedup restarts with identical verdicts") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, corpusTxt)).toDF("doc_id", "text")
    // i%3==0 → copy of corpus (drop), 1 → unique (survive), 2 → copy of
    // the previous unique delta (drop against the smaller id)
    val delta = (10L to 27L).map { i =>
      val t = (i % 3) match {
        case 0 => corpusTxt
        case 1 => uniq(i)
        case _ => uniq(i - 1)
      }
      (i, t)
    }.toDF("doc_id", "text")
    val sel = delta.select(col("doc_id"), col("text"))

    val base = Files.createTempDirectory("graft_sdedup_rec").toFile
    val srcDir = new java.io.File(base, "src")
    FileReplay.stageOrderedReplay(sel, "doc_id", srcDir, nBuckets = 6)

    def start(out: String, ckpt: String) = {
      val init = StreamDedup.corpusIndexState(corpus, "doc_id", "text")
      val stream = s.readStream.schema(sel.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
      StreamDedup.dedupStream(StreamDedup.bandRows(stream, "doc_id", "text"), init)
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

    def verdicts(path: String) = s.read.parquet(path)
      .groupBy("docId", "matched").agg(count(lit(1)).as("n"))
      .as[(Long, Boolean, Long)].collect().toSet
    assert(verdicts(out1) === verdicts(out2))

    def dropped(path: String) = s.read.parquet(path)
      .filter(col("matched")).select("docId").distinct()
      .as[Long].collect().toSet
    val expectDropped = (10L to 27L).filter(i => i % 3 != 1).toSet
    assert(dropped(out1) === expectDropped)
  }
}

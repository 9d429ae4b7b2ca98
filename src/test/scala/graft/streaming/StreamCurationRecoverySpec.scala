package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Recovery + composition properties for the streaming curation
  * pipeline (q183's operator): a checkpointed run stopped mid-stream
  * and restarted must reproduce the exact verdict multiset of an
  * uninterrupted run, and the uninterrupted verdicts must equal a
  * DRIVER-SIDE sequential replay of the composed rule (quality gate →
  * ordered dedup against corpus + earlier arrivals → contamination
  * flag) computed with independent control flow.
  */
class StreamCurationRecoverySpec extends SparkSpec {

  /** "boost43" carries hash-derived weight +946 (self-bigram +923);
    * eight copies lift every fixture text's quality score positive
    * (raw scores run −134..−8357) without touching dedup structure —
    * copies share the suffix, so near-dup pairs stay near-dup.
    */
  private val boost = " boost43" * 8
  private val corpusTxt =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu" +
      boost
  private val evalTxt =
    "secret bench question one two three four five six seven eight nine"
  private def uniq(i: Long) =
    s"u$i one$i two$i three$i four$i five$i six$i seven$i eight$i " +
      s"nine$i ten$i eleven$i" + boost

  test("checkpointed stream curation restarts with identical verdicts") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, corpusTxt)).toDF("doc_id", "text")
    // i%4==0 → corpus copy (dup), 1 → unique, 2 → copy of previous
    // unique (dup vs smaller id), 3 → unique + the eval text appended
    // (contaminated: shares eval 3-grams)
    val delta = (10L to 29L).map { i =>
      val t = (i % 4) match {
        case 0 => corpusTxt
        case 1 => uniq(i)
        case 2 => uniq(i - 1)
        case _ => uniq(i) + " " + evalTxt
      }
      (i, t)
    }.toDF("doc_id", "text")
    val sel = delta.select(col("doc_id"), col("text"))

    val m = 65536L
    val evalGkDf = Seq((0L, evalTxt)).toDF("doc_id", "text")
      .select(explode(StreamCuration.gramKeys(col("text"))).as("gk"))
      .distinct()
    val evalGks = evalGkDf.as[Long].collect()
    // distributed build (the registered q183 path) must equal the
    // driver-side fold bit for bit — pins packedEvalBloom itself
    val words = StreamCuration.packedEvalBloom(evalGkDf, m)
    val localWords = new Array[Long]((m / 64).toInt)
    for (gk <- evalGks; j <- 0 to 2) {
      val p = Math.floorMod(gk >> (15 * j), m) // Dedup.bloomPos twin
      localWords(p.toInt >>> 6) |= 1L << (p.toInt & 63)
    }
    assert(words.toSeq === localWords.toSeq,
      "distributed bloom build diverged from the driver fold")
    def bloomHit(gk: Long): Boolean = (0 to 2).forall { j =>
      val p = Math.floorMod(gk >> (15 * j), m) // Dedup.bloomPos twin
      (words(p.toInt >>> 6) & (1L << (p.toInt & 63))) != 0L
    }

    val base = Files.createTempDirectory("graft_scur_rec").toFile
    val srcDir = new java.io.File(base, "src")
    FileReplay.stageOrderedReplay(sel, "doc_id", srcDir, nBuckets = 6)

    def start(out: String, ckpt: String) = {
      val init = StreamDedup.corpusIndexState(
        corpus.filter(StreamCuration.qualityScore(col("text")) > 0),
        "doc_id", "text")
      val stream = s.readStream.schema(sel.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
      StreamCuration.curationStream(
        StreamCuration.curationRows(stream, "doc_id", "text",
          words), init)
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

    val out2 = new java.io.File(base, "out2").getAbsolutePath
    val ck2 = new java.io.File(base, "ck2").getAbsolutePath
    val sqr = start(out2, ck2)
    try sqr.processAllAvailable() finally sqr.stop()

    def verdicts(path: String) = s.read.parquet(path)
      .groupBy("docId", "matched", "candidate")
      .agg(count(lit(1)).as("n"))
      .as[(Long, Boolean, Boolean, Long)].collect().toSet
    assert(verdicts(out1) === verdicts(out2))

    // driver-side sequential replay with independent control flow:
    // quality-passing docs in id order, each verified against the
    // quality-passing corpus + earlier arrivals by exact hash-set
    // Jaccard (no banding — banding can only MISS pairs; assert the
    // stream found exactly the true dups, i.e. no deterministic FN here)
    val allDocs = corpus.union(delta)
    val flags = allDocs.select(col("doc_id"),
      (StreamCuration.qualityScore(col("text")) > 0).as("q"),
      array_distinct(transform(Dedup.shingles(col("text"), 3),
        t => Dedup.md5Hash64(t))).as("shh"),
      StreamCuration.gramKeys(col("text")).as("gks"))
      .as[(Long, Boolean, Array[Long], Array[Long])].collect()
      .map(r => r._1 -> r).toMap
    def jac(a: Array[Long], b: Array[Long]): Double = {
      val sa = a.toSet
      val inter = b.count(sa.contains)
      val union = sa.size + b.length - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    val evalSet = evalGks.toSet
    var seen = List.empty[Long] // corpus + earlier quality arrivals
    if (flags(1L)._2) seen ::= 1L
    // the stream emits the bloom CANDIDATE flag (exact verify is the
    // caller's batch phase — q183); replay the identical bloom-bit test
    // locally so the expectation is deterministic, and pin no-false-
    // negatives: every exactly-contaminated doc must be a candidate
    val expect = (10L to 29L).flatMap { i =>
      val (_, q, shh, gks) = flags(i)
      if (!q || shh.isEmpty) None
      else {
        val dup = seen.exists(j => jac(flags(j)._3, shh) >= 0.8)
        seen ::= i
        val cand = gks.exists(bloomHit)
        assert(!gks.exists(evalSet.contains) || cand,
          s"bloom false negative on doc $i")
        Some((i, dup, cand))
      }
    }.toSet
    val got = s.read.parquet(out2)
      .groupBy("docId").agg(max("matched").as("m"), max("candidate").as("c"))
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(got === expect)
    // the composition is live: at least one dup and one candidate doc
    assert(expect.exists(_._2) && expect.exists(_._3))
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** State-lifecycle rotation for continuous-ingest dedup (StateRebake,
  * the r17 verdict item): after a rebake — rebuild the batch index from
  * corpus ∪ all prior arrivals, bake it into a FRESH checkpoint, delete
  * the old checkpoint tree wholesale — the resumed stream's verdicts
  * for the next delta must be IDENTICAL to the monolithic never-rotated
  * stream's. The fixture plants every drop class that could distinguish
  * the two: vs corpus, vs a delta1 survivor, vs an earlier delta2
  * arrival, and — the content-completeness probe — vs a delta1 doc that
  * was itself DROPPED (dropped arrivals still join the index; a rebake
  * that indexed only survivors would miss it). Bounded-state claims:
  * the baked checkpoint holds exactly ONE committed batch, and its
  * state row count equals the rebaked index's bucket count.
  */
class StreamRebakeSpec extends SparkSpec {

  private val corpusTxt =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def uniq(i: Long) =
    s"u$i one$i two$i three$i four$i five$i six$i seven$i eight$i nine$i ten$i eleven$i"
  // delta1 doc 14: near-dup of uniq(13) at J = 10/12 — DROPPED but indexed
  private val d14 = uniq(13) + " extra1 extra2"
  // delta2 doc 33: J = 12/14 vs d14 (drop) but only 10/14 vs uniq(13)
  private val t33 = d14 + " extra3 extra4"

  private def delta1(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(10L -> uniq(10), 11L -> uniq(11), 12L -> corpusTxt,
      13L -> uniq(13), 14L -> d14, 15L -> uniq(15))
      .toDF("doc_id", "text")
  }
  private def delta2(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(30L -> corpusTxt, 31L -> uniq(31), 32L -> uniq(11),
      33L -> t33, 34L -> uniq(31), 35L -> uniq(35))
      .toDF("doc_id", "text")
  }

  test("rebaked stream resumes with identical verdicts and bounded state") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, corpusTxt)).toDF("doc_id", "text")
    val base = Files.createTempDirectory("graft_rebake").toFile

    def verdictSet(path: String, minId: Long): Set[(Long, Boolean)] =
      s.read.parquet(path)
        .groupBy("docId").agg(max(col("matched")).as("matched"))
        .as[(Long, Boolean)].collect().toSet.filter(_._1 >= minId)

    // ---------------- monolithic reference: never rotated --------------
    val monoOut = new java.io.File(base, "mono_out").getAbsolutePath
    StateRebake.withConf(s, changelog = true) {
      val srcM = new java.io.File(base, "mono_src")
      FileReplay.stageOrderedReplay(
        delta1(s).unionByName(delta2(s)), "doc_id", srcM, nBuckets = 6)
      val q = StateRebake.startDedupQuery(s, srcM,
        new java.io.File(base, "mono_ck").getAbsolutePath, monoOut, corpus)
      try q.processAllAvailable() finally q.stop()
    }

    // ---------------- rotated run ------------------------------------
    // phase 1: stream delta1 against the corpus index
    val out1 = new java.io.File(base, "rot_out1").getAbsolutePath
    val ck1 = new java.io.File(base, "rot_ck1")
    StateRebake.withConf(s, changelog = true) {
      val src1 = new java.io.File(base, "rot_src1")
      FileReplay.stageOrderedReplay(delta1(s), "doc_id", src1, nBuckets = 3)
      val q = StateRebake.startDedupQuery(s, src1,
        ck1.getAbsolutePath, out1, corpus)
      try {
        q.processAllAvailable()
        // the ROTATION DECISION (RebakePolicy): healthy under generous
        // thresholds, trips on each axis independently
        assert(StateRebake.shouldRotate(q,
          StateRebake.RebakePolicy()).isEmpty)
        assert(StateRebake.shouldRotate(q,
          StateRebake.RebakePolicy(maxStateRows = 0L))
          .exists(_.startsWith("stateRows")))
        assert(StateRebake.shouldRotate(q,
          StateRebake.RebakePolicy(maxStateBytes = 1L))
          .exists(_.startsWith("stateBytes")))
        // the sst-bytes policy axis reads a REAL metric: the probed
        // key must exist in a live RocksDB query's progress (r20
        // review — the previously-probed name existed in no Spark
        // release and the branch silently fell back to memory bytes)
        // name-existence only: a young changelog-mode stream uploads
        // its first snapshot lazily, so the VALUE can legitimately be
        // 0 here — that case is exactly what the memoryUsedBytes
        // fallback covers
        val cm = q.lastProgress.stateOperators(0).customMetrics
        assert(cm.containsKey(StateRebake.SstMetric),
          s"RocksDB progress lacks ${StateRebake.SstMetric}: $cm")
        assert(StateRebake.shouldRotate(q,
          StateRebake.RebakePolicy(maxCommittedBatches = 1L))
          .exists(_.startsWith("committedBatches")))
      } finally q.stop()
    }

    // phase 2: REBAKE — index = corpus ∪ ALL delta1 arrivals (dropped
    // ones included — they are in the live stream's state too)
    val rebaked = corpus.unionByName(delta1(s)).localCheckpoint(true)
    val src2 = new java.io.File(base, "rot_src2")
    val ck2 = new java.io.File(base, "rot_ck2")
    val out2 = new java.io.File(base, "rot_out2").getAbsolutePath
    val bakedRows = StateRebake.bakeDedupCheckpoint(s, rebaked, src2,
      ck2.getAbsolutePath, out2)
    // bounded state, claim 1: state rows == the rebaked index's bucket
    // count (one state row per band bucket, the batch-index footprint)
    val buckets = StreamDedup.bandRows(rebaked, "doc_id", "text")
      .toDF().select("bandHash").distinct().count()
    assert(bakedRows == buckets, s"baked $bakedRows rows != $buckets buckets")
    // bounded state, claim 2: the fresh checkpoint holds exactly ONE
    // committed batch — rotation reset the version history
    val commits = new java.io.File(ck2, "commits").listFiles()
      .map(_.getName).filter(_.matches("\\d+")).sorted
    assert(commits.toSeq == Seq("0"), s"commits after bake: ${commits.toSeq}")
    // the OLD checkpoint tree (and old replay dir) are disposable NOW —
    // delete it wholesale before the resume even starts; the guard
    // refuses anything that does not look like a checkpoint
    intercept[IllegalArgumentException] {
      StateRebake.deleteCheckpointTree(new java.io.File(base, "rot_src1"))
    }
    StateRebake.deleteCheckpointTree(ck1)
    assert(!ck1.exists())

    // phase 3: resume from the baked checkpoint over delta2
    StateRebake.withConf(s, changelog = true) {
      FileReplay.stageOrderedReplay(delta2(s), "doc_id", src2,
        nBuckets = 3, clear = false)
      val q = StateRebake.startDedupQuery(s, src2,
        ck2.getAbsolutePath, out2, rebaked)
      try q.processAllAvailable() finally q.stop()
    }

    // identical survivor semantics for the post-rotation delta
    val mono2 = verdictSet(monoOut, minId = 30L)
    val rot2 = verdictSet(out2, minId = 30L)
    assert(rot2 == mono2, s"rotated $rot2 != monolithic $mono2")
    // closed form: 30 vs corpus, 32 vs delta1 survivor, 33 vs the
    // DROPPED delta1 doc only, 34 vs the earlier delta2 arrival
    assert(rot2.filter(_._2).map(_._1) == Set(30L, 32L, 33L, 34L))
    assert(rot2.filterNot(_._2).map(_._1) == Set(31L, 35L))
    // and doc 33 is NOT within threshold of any SURVIVOR — the drop
    // really rode on the dropped-doc block the rebake preserved
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.split(" ")
      (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    def jac(a: Set[String], b: Set[String]): Double =
      a.intersect(b).size.toDouble / a.union(b).size
    assert(jac(shingleSet(t33), shingleSet(uniq(13))) < 0.8)
    assert(jac(shingleSet(t33), shingleSet(d14)) >= 0.8)
  }
}

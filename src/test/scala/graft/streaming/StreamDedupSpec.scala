package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming LSH dedup (q156's operator): the initial-state index +
  * ordered replay must reproduce the batch pairwise drop rule exactly.
  */
class StreamDedupSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // Corpus doc 1 and delta docs 10/20 share a long 12-token sentence
  // (Jaccard 1.0 pairwise); delta 30 is unrelated; delta 40 is a near-dup
  // of 30 differing in one trailing token (10 shingles shared of 12 → 0.83).
  private val sentence = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val other = "one two three four five six seven eight nine ten eleven twelve"
  private val otherNear = "one two three four five six seven eight nine ten eleven thirteen"

  test("stream dedup ≡ batch pairwise rule with corpus + intra-delta matches") {
    val s = spark
    import s.implicits._
    val corpus = docsDf(Seq(1L -> sentence, 2L -> "completely different words entirely here now today ok fine yes"))
    val delta = docsDf(Seq(10L -> sentence, 30L -> other, 40L -> otherNear))

    val init = StreamDedup.corpusIndexState(corpus, "doc_id", "text")
    val srcDir = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir")), "graft_test_sdedup")
    val sel = delta.select(col("doc_id"), col("text"))
    FileReplay.stageOrderedReplay(sel, "doc_id", srcDir, nBuckets = 3)
    val verdicts = FileReplay.runToTable(s, srcDir, sel.schema,
      "graft_test_sdedup_tbl") { stream =>
      StreamDedup.dedupStream(
        StreamDedup.bandRows(stream, "doc_id", "text"), init).toDF()
    }
    val dropped = verdicts.filter(col("matched"))
      .select("docId").distinct().as[Long].collect().toSet
    // 10 matches corpus doc 1; 30 survives; 40 matches earlier delta 30.
    assert(dropped === Set(10L, 40L))
  }

  test("dropped docs still index: a chain dup matches a dropped predecessor") {
    val s = spark
    import s.implicits._
    // 10 matches corpus; 20 matches 10 (which was dropped) — q116's rule
    // still drops 20 because dropped docs join the index.
    val corpus = docsDf(Seq(1L -> sentence))
    val delta = docsDf(Seq(10L -> sentence, 20L -> sentence))
    val init = StreamDedup.corpusIndexState(corpus, "doc_id", "text")
    val srcDir = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir")), "graft_test_sdedup2")
    val sel = delta.select(col("doc_id"), col("text"))
    FileReplay.stageOrderedReplay(sel, "doc_id", srcDir, nBuckets = 2)
    val verdicts = FileReplay.runToTable(s, srcDir, sel.schema,
      "graft_test_sdedup2_tbl") { stream =>
      StreamDedup.dedupStream(
        StreamDedup.bandRows(stream, "doc_id", "text"), init).toDF()
    }
    val dropped = verdicts.filter(col("matched"))
      .select("docId").distinct().as[Long].collect().toSet
    assert(dropped === Set(10L, 20L))
  }

  test("short docs (< n tokens) never become candidates") {
    val s = spark
    import s.implicits._
    val delta = docsDf(Seq(10L -> "one two", 20L -> "one two"))
    assert(StreamDedup.bandRows(delta, "doc_id", "text").count() === 0L)
  }
}

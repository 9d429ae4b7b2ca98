package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden test of the distributed BPE trainer against a hand-computed
  * merge sequence (independently verified with a reference pure-python
  * BPE: greedy max-count merges, lexicographically-smallest tiebreak).
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // corpus: hello x3, hell x2, help x1, lo x4
  private val corpus = Seq(
    "hello hello hello hell hell help lo lo lo lo").toDF("text")

  test("merge sequence matches the reference BPE on a golden corpus") {
    val words = BpeTrainer.wordTable(corpus, "text")
    val (merges, finalWords) = BpeTrainer.train(words, 5)
    assert(merges.map(m => (m.a, m.b, m.cnt)) == Seq(
      ("l", "o", 7L),   // hello(3) + lo(4)
      ("e", "l", 6L),   // hello(3) + hell(2) + help(1)
      ("h", "el", 6L),
      ("hel", "lo", 3L),
      ("hel", "l", 2L)))
    // final segmentations under all 5 merges
    val segs = finalWords
      .select(col("token"),
        ltrim(call_function("replace",
          col("repr"), lit(BpeTrainer.M), lit(" "))).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    finalWords.unpersist()
    assert(segs == Map(
      "hello" -> "hello", "hell" -> "hell", "help" -> "hel p", "lo" -> "lo"))
  }

  test("segment() replays learned merges greedily left-to-right") {
    val merges = Seq(
      BpeTrainer.MergeStep(1, "l", "o", 0),
      BpeTrainer.MergeStep(2, "e", "l", 0))
    val out = Seq("hellolo", "ellel").toDF("token")
      .select(ltrim(call_function("replace",
        BpeTrainer.segment(col("token"), merges),
        lit(BpeTrainer.M), lit(" "))).as("seg"))
      .as[String].collect().toSeq
    // "hellolo": lo-merges first (h e l lo lo), then e+l
    assert(out == Seq("h el lo lo", "el l el"))
  }
}

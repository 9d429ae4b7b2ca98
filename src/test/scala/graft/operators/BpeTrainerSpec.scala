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

  test("trainBatched equals sequential greedy merge-for-merge (golden corpus)") {
    val words = BpeTrainer.wordTable(corpus, "text")
    val (seq5, fseq) = BpeTrainer.train(words, 5)
    fseq.unpersist()
    val (bat5, fbat, rounds) = BpeTrainer.trainBatched(words, 5, batchSize = 4)
    assert(bat5 == seq5)
    assert(rounds <= 5)
    val segs = fbat.select(col("token"),
        ltrim(call_function("replace",
          col("repr"), lit(BpeTrainer.M), lit(" "))).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fbat.unpersist()
    assert(segs == Map(
      "hello" -> "hello", "hell" -> "hell", "help" -> "hel p", "lo" -> "lo"))
  }

  test("trainBatched equals sequential greedy on fuzzed corpora, and batches") {
    // synthetic corpora with many disjoint high-count bigrams (the
    // batching-friendly regime) AND colliding/tied shapes
    for (seed <- 1 to 3) {
      val docs = spark.range(400)
        .select(concat_ws(" ",
          (0 until 12).map(j =>
            expr(s"substr('abcdefghijklmnopqrstuvwxyz', " +
              s"1 + pmod(xxhash64(id, $j, $seed), 24), " +
              s"2 + pmod(xxhash64(id, $j, $seed + 100), 4))")): _*)
          .as("text"))
      val words = BpeTrainer.wordTable(docs, "text")
      val n = 30
      val (sq, fs) = BpeTrainer.train(words, n)
      fs.unpersist()
      val (bt, fb, rounds) = BpeTrainer.trainBatched(words, n, batchSize = 8)
      fb.unpersist()
      assert(bt == sq, s"seed $seed diverged:\n batched=$bt\n greedy =$sq")
      assert(rounds < n, s"seed $seed never batched ($rounds rounds for $n merges)")
    }
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

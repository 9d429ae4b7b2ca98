package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training — the full trainer loop an LLM data
  * pipeline actually runs (q133 was one step of it): count adjacent
  * symbol pairs over the word-type table, pick the top merge with a
  * deterministic tiebreak, re-segment every word, repeat.
  *
  * Representation: a word's segmentation is ONE string, each symbol
  * prefixed by the marker \u0001 (e.g. "hello" starts as
  * "\u0001h\u0001e\u0001l\u0001l\u0001o"). Applying a merge (a,b)→ab is
  * then literal `replace(repr, M+a+M+b, M+a+b)` — string replace is
  * left-to-right non-overlapping, which IS BPE's greedy application
  * order, and the marker prefix makes a symbol match positionally exact
  * (no suffix can alias: every symbol start is marked). The same two
  * primitives exist verbatim in DuckDB, so the oracle replays training
  * as 10 unrolled CTE blocks with identical semantics.
  *
  * Scale shape: training state is the distributed WORD-TYPE table
  * (token, repr, freq) — corpus-size-independent after the first
  * aggregation, exactly how HF/SentencePiece trainers operate. Each
  * round is one pair-key partial aggregation (vocabulary-pair
  * cardinality, never corpus cardinality) plus one TakeOrdered(1); the
  * only driver traffic is the single winning pair per round — the merge
  * table itself, which is the trainer's OUTPUT and is bounded by the
  * round count. Per-round results are cached and the previous round
  * unpersisted (the CC iteration pattern).
  */
object BpeTrainer {

  val M = "\u0001"

  final case class MergeStep(step: Int, a: String, b: String, cnt: Long)

  /** (token, repr, freq) word-type table from a corpus of documents:
    * whitespace tokens, lowercased, each split to characters with the
    * marker prefix. `freq` is the corpus occurrence count.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)
    docs.select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .withColumn("repr", regexp_replace(col("token"), "(.)", M + "$1"))
  }

  /** Adjacent symbol pairs of each word type, freq-weighted (q133's
    * clipped-slice zip on the marker-split symbol array — total on
    * single-symbol words).
    */
  private def pairs(words: DataFrame): DataFrame = {
    // split on the marker: element 1 is the empty prefix, symbols follow
    val sym = expr(s"slice(split(repr, '$M'), 2, 2147483647)")
    val nPairs = greatest(size(col("sym")) - 1, lit(0))
    val zipped = arrays_zip(
      slice(col("sym"), lit(1), nPairs).as("a"),
      slice(col("sym"), lit(2), nPairs).as("b"))
    words.select(sym.as("sym"), col("freq"))
      .select(explode(zipped).as("z"), col("freq"))
      .select(col("z.a").as("a"), col("z.b").as("b"), col("freq"))
      .groupBy("a", "b")
      .agg(sum("freq").as("cnt"))
  }

  /** Train `rounds` merges. Returns the merge sequence and the final
    * word-type table (token, repr, freq) under all merges.
    */
  def train(words0: DataFrame, rounds: Int): (Seq[MergeStep], DataFrame) = {
    val steps = Seq.newBuilder[MergeStep]
    var cur = words0.cache()
    for (step <- 1 to rounds) {
      val top = pairs(cur)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"BPE vocabulary exhausted before round $step")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      steps += MergeStep(step, a, b, cnt)
      val next = cur.withColumn("repr",
        call_function("replace",
          col("repr"), lit(M + a + M + b), lit(M + a + b))).cache()
      next.count() // materialize before dropping the parent
      cur.unpersist()
      cur = next
    }
    (steps.result(), cur)
  }

  /** Greedy left-to-right BPE segmentation of arbitrary tokens under an
    * already-learned merge list (inference side of the trainer).
    */
  def segment(tokenCol: Column, merges: Seq[MergeStep]): Column =
    merges.foldLeft(regexp_replace(tokenCol, "(.)", M + "$1")) {
      (repr, m) =>
        call_function("replace", repr, lit(M + m.a + M + m.b), lit(M + m.a + m.b))
    }
}

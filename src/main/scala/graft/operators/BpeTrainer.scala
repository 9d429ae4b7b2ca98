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
    val toks = graft.core.Tok.words(col(textCol))
    docs.select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .withColumn("repr", regexp_replace(col("token"), "(?s)(.)", M + "$1"))
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
    // eager localCheckpoint per round: materializes the round AND
    // truncates lineage (the CC iteration pattern). Stacking cache()
    // entries instead nests each round's AQE plan inside the next
    // cached plan's tree STRING, which compounds per round — a 30-round
    // training OOM'd an 8g driver just RENDERING the plan for a log
    // line. State is the word-TYPE table, so each checkpoint is
    // vocabulary-sized, never corpus-sized.
    var cur = words0.localCheckpoint()
    for (step <- 1 to rounds) {
      val top = pairs(cur)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"BPE vocabulary exhausted before round $step")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      steps += MergeStep(step, a, b, cnt)
      val stepped = cur.withColumn("repr",
        call_function("replace",
          col("repr"), lit(M + a + M + b), lit(M + a + b))).localCheckpoint()
      // release the superseded round's blocks (r14-advice pattern —
      // Dataset.unpersist can't reach localCheckpoint storage); a
      // 30k-merge run otherwise accrues O(rounds)·vocab-table storage
      graft.core.Checkpoints.release(cur)
      cur = stepped
    }
    (steps.result(), cur)
  }

  /** BATCHED BPE training: per distributed count, select the top-m
    * merges that are PROVABLY order-safe — the result is literally
    * identical to sequential greedy [[train]], round count drops from
    * `totalMerges` to `totalMerges / avg-batch` (q142's trainer is
    * correct but driver-synchronous per merge; a 30k-merge production
    * vocabulary is round-latency-bound, which this addresses).
    *
    * Selection rule (walk the ranked pair list (cnt desc, a, b) from
    * the top; STOP at the first violation — skipping is NOT allowed):
    *  1. the candidate's symbols {a, b, a+b} are disjoint from every
    *     previously selected merge's {a, b, a+b}, and
    *  2. the merged string a+b does not already exist as a symbol in
    *     the vocabulary, and
    *  3. (after the walk) pop trailing selections until the LAST
    *     selected count is STRICTLY greater than the first excluded
    *     pair's count (a batch of 1 is always safe — it IS the greedy
    *     step).
    *
    * Why this equals sequential greedy, by induction over the batch
    * p₁ > p₂ > … > p_t (ranked prefix order): after applying p₁..p_i,
    *  - p_{i+1}'s count is unchanged (its symbols are untouched by the
    *    disjointness rule);
    *  - no OLD pair's count ever increases: replacing two symbols with
    *    one brand-new symbol (rule 2 guarantees a+b is new) never
    *    creates an adjacency between two old symbols;
    *  - every NEW pair key contains a brand-new merged symbol, and its
    *    count is bounded by the count of a parent pair that SHARES a
    *    symbol with some p_j — which the stop-at-first-violation rule
    *    places strictly below rank t, so by rule 3 its count is
    *    < cnt(p_t) ≤ cnt(p_{i+1});
    *  - ties among selected merges resolve by the same (a, b)
    *    lexicographic tiebreak in both schedules, and rule 3 excludes
    *    count ties against anything outside the batch.
    * Hence greedy's next pick after p₁..p_i is exactly p_{i+1}. ∎
    *
    * The driver-side symbol vocabulary for rule 2 is alphabet-bounded:
    * |initial distinct characters| + one symbol per applied merge.
    */
  def trainBatched(words0: DataFrame, totalMerges: Int, batchSize: Int)
      : (Seq[MergeStep], DataFrame, Int) = {
    require(batchSize >= 1 && totalMerges >= 1)
    val vocab = scala.collection.mutable.Set[String]()
    words0.select(explode(expr(s"slice(split(repr, '$M'), 2, 2147483647)")).as("s"))
      .distinct().collect().foreach(r => vocab += r.getString(0))
    // eager localCheckpoint per round — see train() for why not cache()
    var cur = words0.localCheckpoint()
    val steps = Seq.newBuilder[MergeStep]
    var done = 0
    var rounds = 0
    while (done < totalMerges) {
      val want = math.min(totalMerges - done, batchSize)
      val top = pairs(cur)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(top.nonEmpty, s"BPE vocabulary exhausted after $done merges")
      val sel = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var nextCnt: Option[Long] = None
      if (vocab.contains(top(0)._1 + top(0)._2)) {
        sel += top(0) // merged symbol collides: a plain greedy step of 1
      } else {
        val used = scala.collection.mutable.Set[String]()
        var i = 0
        while (i < top.length && sel.size < want && nextCnt.isEmpty) {
          val (a, b, cnt) = top(i)
          val m = a + b
          if (used(a) || used(b) || used(m) || vocab(m)) nextCnt = Some(cnt)
          else {
            sel += ((a, b, cnt))
            used += a; used += b; used += m
          }
          i += 1
        }
        if (nextCnt.isEmpty && i < top.length) nextCnt = Some(top(i)._3)
        // rule 3: strict count drop after the batch (popped pairs keep
        // the same count, so the comparison value never changes)
        while (sel.size > 1 && nextCnt.contains(sel.last._3))
          sel.remove(sel.size - 1)
      }
      sel.foreach { case (a, b, cnt) =>
        done += 1
        steps += MergeStep(done, a, b, cnt)
        vocab += a + b
      }
      val stepped = cur.withColumn("repr",
        sel.foldLeft(col("repr")) { case (c, (a, b, _)) =>
          call_function("replace", c, lit(M + a + M + b), lit(M + a + b))
        }).localCheckpoint()
      graft.core.Checkpoints.release(cur) // see train()
      cur = stepped
      rounds += 1
    }
    (steps.result(), cur, rounds)
  }

  /** Greedy left-to-right BPE segmentation of arbitrary tokens under an
    * already-learned merge list (inference side of the trainer).
    *
    * The marking regex carries (?s): Java `.` skips ALL line
    * terminators (\n \r U+0085 U+2028 U+2029) while RE2's skips only
    * \n — and U+0085/U+2028/U+2029 are NOT Tok separators, so a token
    * can legally contain them. Without DOTALL the two engines marked
    * hostile tokens differently (and both differed from the
    * mark-every-code-point kernel); with it every code point is marked
    * on all three paths (r20 review find, spec-pinned).
    */
  def segment(tokenCol: Column, merges: Seq[MergeStep]): Column =
    merges.foldLeft(regexp_replace(tokenCol, "(?s)(.)", M + "$1")) {
      (repr, m) =>
        call_function("replace", repr, lit(M + m.a + M + m.b), lit(M + m.a + m.b))
    }

  /** Corpus-level BPE ENCODE — the production tokenization pass that
    * APPLIES a trained merge table to every document (the inference
    * twin of [[train]]; HF tokenizers call this `encode`). Per doc:
    * whitespace-split, [[segment]] each word under the merge list (a
    * pure chain of codegen'd string replaces — zero shuffle, zero UDF,
    * the whole pass lives inside the scan's WholeStageCodegen), rejoin
    * with spaces, and report
    *   n_tokens  = the BPE token count (one  marker per symbol),
    *   enc_md5   = md5 of the full marked encoding (compact equality
    *               witness for the entire token stream).
    * Cross-engine exact: regexp char-marking, literal replace (both
    * engines are left-to-right non-overlapping — BPE's greedy order),
    * chr(1) markers and md5 agree byte-for-byte; [[encodeOracleSql]]
    * generates the DuckDB replay from the SAME merge list so the two
    * sides can never drift.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[MergeStep]): DataFrame = {
    val words = graft.core.Tok.words(col(textCol))
    // Past 64 merges the chained-Column segment() builds a merge-count-
    // deep expression tree (ColumnNode conversion recursion overflows
    // the driver stack at 1000 merges — measured r20); the fused
    // kernel applies the table as DATA with constant plan depth.
    // Same semantics either way (BpeApplyMergesSpec pins equality), so
    // the small-table queries keep their historical plans/oracles.
    def seg(tk: Column): Column =
      if (merges.size > 64) graft.functions.BpeApplyMerges(tk, merges)
      else segment(tk, merges)
    val enc = concat_ws(" ",
      transform(words, tk => seg(tk)))
    docs.select(col(idCol), enc.as("enc"))
      .select(col(idCol),
        ((length(col("enc")) -
          length(call_function("replace", col("enc"), lit(M), lit("")))))
          .cast("long").as("n_tokens"),
        md5(col("enc").cast("binary")).as("enc_md5"))
  }

  /** The DuckDB replay of [[encode]]'s per-token chain, generated from
    * the same merge list (the "generate unrolled SQL, never hand-copy"
    * rule). `tk` is the free variable naming the token expression.
    */
  def encodeOracleSql(merges: Seq[MergeStep]): String = {
    def q(s: String): String =
      s.flatMap(c => if (c == '\'') "''" else c.toString)
    val base = "regexp_replace(tk, '(?s)(.)', chr(1) || '\\1', 'g')"
    merges.foldLeft(base) { (acc, m) =>
      s"replace($acc, chr(1) || '${q(m.a)}' || chr(1) || '${q(m.b)}'," +
        s" chr(1) || '${q(m.a + m.b)}')"
    }
  }
}

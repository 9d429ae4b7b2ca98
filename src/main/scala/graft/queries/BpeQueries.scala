package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.BpeTrainer

/** The full BPE merge-training loop (operators/BpeTrainer) through the
  * DuckDB gate: the oracle replays training as 10 UNROLLED CTE blocks
  * using the same two string primitives (marker-prefixed symbol reprs +
  * literal `replace`, whose left-to-right non-overlapping semantics are
  * exactly BPE's greedy application order in both engines).
  */
object BpeQueries {

  private val Rounds = 10

  /** chr(1)-safe DuckDB expression pieces for the marker encoding. */
  private val mSql = "chr(1)"

  /** The unrolled training CTE chain: words0 .. words{Rounds}, best1 ..
    * best{Rounds}. Word reprs are injective per token (strip markers =
    * token), so no re-grouping is needed between rounds.
    */
  private def trainCte: String = trainCteN(Rounds)

  private def trainCteN(n: Int, src: String = "documents"): String = {
    val base = s"""
      toks AS (
        SELECT unnest(${graft.core.Tok.sqlWords("text")}) AS token
        FROM $src),
      words0 AS MATERIALIZED (
        SELECT token,
               regexp_replace(token, '(?s)(.)', $mSql || '\\1', 'g') AS repr,
               CAST(count(*) AS BIGINT) AS freq
        FROM toks GROUP BY 1)"""
    val rounds = (1 to n).map { k =>
      s"""
      pairs$k AS (
        SELECT s[i] AS a, s[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT string_split(repr, $mSql)[2:] AS s, freq
              FROM words${k - 1}),
             unnest(range(1, len(s))) AS t(i)
        GROUP BY 1, 2),
      best$k AS MATERIALIZED (
        SELECT a, b, cnt FROM pairs$k ORDER BY cnt DESC, a, b LIMIT 1),
      words$k AS MATERIALIZED (
        SELECT token,
               replace(repr, $mSql || a || $mSql || b, $mSql || a || b) AS repr,
               freq
        FROM words${k - 1}, best$k)"""
    }.mkString(",", ",", "")
    base + rounds
  }

  /** q142: the learned merge table — step, pair, merged symbol, count. */
  val q142BpeTrain = Q(
    "q142_bpe_train",
    (s, dir) => {
      val words = BpeTrainer.wordTable(Tables.load(s, dir, "documents"), "text")
      val (merges, finalWords) = BpeTrainer.train(words, Rounds)
      finalWords.unpersist()
      val rows = merges.map(m => (m.step.toLong, m.a, m.b, m.a + m.b, m.cnt))
      import s.implicits._
      rows.toDF("step", "pair_a", "pair_b", "merged", "cnt")
    },
    Some(s"""
      WITH $trainCte
      SELECT * FROM (
        ${(1 to Rounds).map(k =>
          s"SELECT CAST($k AS BIGINT) AS step, a AS pair_a, b AS pair_b, a || b AS merged, cnt FROM best$k")
          .mkString("\n        UNION ALL ")}
      ) ORDER BY step"""))

  /** q143: every document re-tokenized under the learned merges —
    * per-doc symbol count + md5 of the space-joined symbol stream
    * (order-exact via the position sort). The token→final-repr map is a
    * broadcast-sized vocabulary join, never a per-position merge replay.
    */
  val q143BpeRetokenize = Q(
    "q143_bpe_retokenize",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val words = BpeTrainer.wordTable(docs, "text")
      val (merges, finalWords) = BpeTrainer.train(words, Rounds)
      val vocab = finalWords.select(col("token"),
        // symbol count = marker count; readable stream = markers → spaces
        (length(col("repr")) - length(call_function("replace",
          col("repr"), lit(BpeTrainer.M), lit("")))).cast("long").as("n_sym"),
        ltrim(call_function("replace",
          col("repr"), lit(BpeTrainer.M), lit(" "))).as("sym_str"))
      val toks = graft.core.Tok.words(col("text"))
      val positioned = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
      positioned.join(broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
          sum("n_sym").as("n_symbols"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("sym_str")))),
            x => x.getField("sym_str")), " ")).as("sym_md5"))
        .select("doc_id", "n_symbols", "sym_md5")
    },
    Some(s"""
      WITH $trainCte,
      vocab AS (
        SELECT token,
               CAST(len(repr) - len(replace(repr, $mSql, '')) AS BIGINT) AS n_sym,
               ltrim(replace(repr, $mSql, ' ')) AS sym_str
        FROM words$Rounds),
      pos AS (
        SELECT doc_id, i - 1 AS pos, tk[i] AS token
        FROM (SELECT doc_id,
                     ${graft.core.Tok.sqlWords("text")} AS tk
              FROM documents),
             unnest(range(1, len(tk) + 1)) AS t(i))
      SELECT doc_id,
             CAST(sum(n_sym) AS BIGINT) AS n_symbols,
             md5(string_agg(sym_str, ' ' ORDER BY pos)) AS sym_md5
      FROM pos JOIN vocab USING (token)
      GROUP BY 1"""))

  private val BatchMerges = 50

  /** q154: BATCHED BPE training (BpeTrainer.trainBatched — top-m
    * provably order-safe merges per distributed count) gated against
    * the literal SEQUENTIAL greedy replay: the oracle is 50 unrolled
    * one-merge-per-round CTE blocks, so a hash match IS the proof that
    * the batch schedule produced the identical merge table — same
    * pairs, same order, same counts — that one-at-a-time greedy
    * training produces. (The safety argument lives at
    * BpeTrainer.trainBatched; this query checks it empirically against
    * an independent engine at every SF, 5× past the depth q142 gates.)
    */
  val q154BpeBatchTrain = Q(
    "q154_bpe_batch_train",
    (s, dir) => {
      val words = BpeTrainer.wordTable(Tables.load(s, dir, "documents"), "text")
      val (merges, finalWords, _) =
        BpeTrainer.trainBatched(words, BatchMerges, batchSize = 8)
      finalWords.unpersist()
      val rows = merges.map(m => (m.step.toLong, m.a, m.b, m.a + m.b, m.cnt))
      import s.implicits._
      rows.toDF("step", "pair_a", "pair_b", "merged", "cnt")
    },
    Some(s"""
      WITH ${trainCteN(BatchMerges)}
      SELECT * FROM (
        ${(1 to BatchMerges).map(k =>
          s"SELECT CAST($k AS BIGINT) AS step, a AS pair_a, b AS pair_b, a || b AS merged, cnt FROM best$k")
          .mkString("\n        UNION ALL ")}
      ) ORDER BY step"""))

  // ---- production-vocab posture: train on a SAMPLE, encode the full
  // corpus (r18 verdict item 5). A 30k-merge tokenizer cannot afford
  // per-round full-corpus scans; the standard answer is a capped
  // deterministic training sample. Selection is md5-hash replayable:
  // doc_id joins the sample iff md5Hash64(doc_id || '_bpes') % 4 == 0.

  private val SampleSql =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_bpes'), 18, 15) " +
      "AS BIGINT) % 4 = 0"

  private def sampled(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(pmod(graft.operators.Dedup.md5Hash64(
      concat(col("doc_id").cast("string"), lit("_bpes"))), lit(4)) === 0)

  private def sampledMerges(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[BpeTrainer.MergeStep] = {
    val words = BpeTrainer.wordTable(
      sampled(Tables.load(s, dir, "documents")), "text")
    val (merges, finalWords) = BpeTrainer.train(words, Rounds)
    finalWords.unpersist()
    merges
  }

  /** q219: the merge table trained on the hash-selected sample — the
    * oracle replays greedy training over the SAME sampled relation, so
    * a hash match proves selection + training end to end.
    */
  val q219BpeSampledTrain = Q(
    "q219_bpe_sampled_train",
    (s, dir) => {
      val rows = sampledMerges(s, dir)
        .map(m => (m.step.toLong, m.a, m.b, m.a + m.b, m.cnt))
      import s.implicits._
      rows.toDF("step", "pair_a", "pair_b", "merged", "cnt")
    },
    Some(s"""
      WITH documents_s AS MATERIALIZED (
        SELECT * FROM documents WHERE $SampleSql),
      ${trainCteN(Rounds, "documents_s")}
      SELECT * FROM (
        ${(1 to Rounds).map(k =>
          s"SELECT CAST($k AS BIGINT) AS step, a AS pair_a, b AS pair_b, a || b AS merged, cnt FROM best$k")
          .mkString("\n        UNION ALL ")}
      ) ORDER BY step"""))

  /** q220: the FULL corpus encoded (q208's zero-shuffle pass) under the
    * sample-trained merges — the production shape: cheap train, one
    * corpus-wide encode. The oracle is fully SELF-CONTAINED: it replays
    * sampled training (the q219 CTEs) and then applies each round's
    * best pair as one doc-level replace step reading best$k DIRECTLY —
    * no Scala-side merge literals anywhere, so a hash match proves
    * sample selection, training AND encoding in one gate. Doc-level
    * replace ≡ per-token segmentation: the pattern
    * chr(1)·a·chr(1)·b contains no space, and tokens join with single
    * spaces, so no match can cross a token boundary.
    */
  val q220BpeSampledEncode = Q(
    "q220_bpe_sampled_encode",
    (s, dir) => BpeTrainer.encode(
      Tables.load(s, dir, "documents"), "doc_id", "text",
      sampledMerges(s, dir)),
    Some {
      val steps = (1 to Rounds).map { k =>
        s"""
      enc$k AS (
        SELECT doc_id,
               replace(e, $mSql || b.a || $mSql || b.b, $mSql || b.a || b.b) AS e
        FROM enc${k - 1}, best$k b)"""
      }.mkString(",")
      s"""
      WITH documents_s AS MATERIALIZED (
        SELECT * FROM documents WHERE $SampleSql),
      ${trainCteN(Rounds, "documents_s")},
      enc0 AS (
        SELECT doc_id,
               array_to_string(list_transform(
                 ${graft.core.Tok.sqlWords("text")},
                 tk -> regexp_replace(tk, '(?s)(.)', $mSql || '\\1', 'g')),
                 ' ') AS e
        FROM documents),$steps
      SELECT doc_id,
             CAST(len(e) - len(replace(e, $mSql, '')) AS BIGINT) AS n_tokens,
             md5(e) AS enc_md5
      FROM enc$Rounds"""
    })

  val qs: Seq[Q] = Seq(q142BpeTrain, q143BpeRetokenize, q154BpeBatchTrain,
    q219BpeSampledTrain, q220BpeSampledEncode)
}

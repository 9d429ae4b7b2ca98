package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Totality of document-consuming queries on degenerate (0–2 token) docs.
  *
  * Round-5 lesson made explicit as a gate: a `size(w) >= k` filter does NOT
  * protect a later array-window expression in the same plan — the
  * explode-inferred non-empty predicate merges into the SAME Filter node and
  * codegen subexpression elimination evaluates the shared array expr before
  * the AND short-circuits. Every gram/window expression must therefore be
  * total on its own. This spec runs the text queries over a corpus whose
  * documents are 0–3 tokens long (shorter than any window) and asserts they
  * neither throw nor emit rows for the degenerate docs.
  */
class ShortDocTotalitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-shortdoc").toFile
    d.deleteOnExit()
    val docs = Seq(
      (0L, "", "en", "web"),                      // empty
      (1L, "one", "en", "web"),                   // 1 token
      (2L, "two tokens", "en", "web"),            // 2 tokens
      (199L, "exactly three tokens", "en", "web"), // eval-split doc_id
      (398L, "three more tokens", "en", "web"),
      (5L, "a longer document with plenty of tokens to form grams and windows repeatedly", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private val docQueries = Seq(
    "q30_text_stats", "q31_token_count", "q32_quality_score", "q33_lang_id",
    "q34_dedup_exact", "q35_fingerprint", "q36_ngram_jaccard",
    "q57_rolling_fingerprint", "q59_redact", "q84_decontaminate",
    "q85_hash_split", "q86_repetition", "q98_span_dedup",
    "q107_stratified_sample", "q108_line_dedup",
    "q131_tfidf", "q132_chunk_overlap", "q133_bpe_pairs",
    "q136_heavy_hitters", "q137_token_budget", "q138_bigram_familiarity")

  for (name <- docQueries)
    test(s"$name is total on 0-2 token documents") {
      val q = Registry.all.find(_.name == name).get
      q.run(spark, dir).collect() // must not throw (ANSI element_at, sequence)
    }

  test("q84 short docs contribute no grams (and the eval doc's grams still match)") {
    val q = Registry.all.find(_.name == "q84_decontaminate").get
    val rows = q.run(spark, dir).collect()
    // doc 398 shares no trigram with eval doc 199; docs 0-2 have no trigrams
    assert(rows.forall(r => r.getLong(0) != 0L && r.getLong(0) != 1L && r.getLong(0) != 2L))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, Tok}
import graft.functions.NgramLmScore
import graft.operators.{LangId, NgramLm, NgramLmModel}

/** N-gram LM perplexity scoring through the trained-artifact seam (the
  * r19 verdict's top item — the KenLM/CCNet posture): a smoothed
  * character-trigram LM trained on an embedded reference corpus scores
  * every document by exact scaled-integer total log-prob; fixed
  * model-derived cutoffs bucket docs head/middle/tail; and the bucket
  * keys a full curation funnel (the q221 shape). All three queries'
  * oracles are GENERATED from the same trained model object
  * (operators/NgramLm.scala — the never-hand-copy rule), so the two
  * engines' arithmetic cannot drift.
  *
  * The scored corpus is a synthesized four-way mix over `documents`
  * (doc_id % 4): the raw fixture text, fixture text + a held-out
  * fluent-English sentence, a held-out fluent sentence alone, and a
  * held-out CJK/Thai/noise sentence alone — so the gate exercises all
  * three lookup tiers (seen trigram / seen context / unseen context)
  * and the buckets separate real fluency classes.
  */
object NgramLmQueries {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  private lazy val model: NgramLmModel = NgramLm.fixture
  private lazy val (tLo, tHi) = NgramLm.thresholds(model)

  private val fluent: Seq[String] =
    LangId.evalExamples.collect { case ("en", s) => s }
  private val noisy: Seq[String] =
    LangId.evalExamples.collect {
      case (l, s) if Seq("zh", "ja", "th", "und").contains(l) => s
    }

  /** The four-way mixed corpus (Spark side). */
  private def mixedDocs(s: SparkSession, dir: String): DataFrame = {
    val fl = array(fluent.map(lit): _*)
    val no = array(noisy.map(lit): _*)
    val ixF = (expr("doc_id div 4") % fluent.size).cast("int") + 1
    val ixN = (expr("doc_id div 4") % noisy.size).cast("int") + 1
    t(s, dir)("documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(4L)) === 0, col("text"))
        .when(pmod(col("doc_id"), lit(4L)) === 1,
          concat(col("text"), lit(" "), element_at(fl, ixF)))
        .when(pmod(col("doc_id"), lit(4L)) === 2, element_at(fl, ixF))
        .otherwise(element_at(no, ixN))
        .as("text"))
  }

  /** The same corpus as DuckDB SQL (doc_id is non-negative, so `%`
    * agrees across engines).
    */
  private def mixedDocsSql: String = {
    val fl = fluent.map(NgramLm.sq).mkString("[", ", ", "]")
    val no = noisy.map(NgramLm.sq).mkString("[", ", ", "]")
    s"""SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN text
             WHEN 1 THEN text || ' ' ||
               ($fl)[CAST((doc_id // 4) % ${fluent.size} AS INT) + 1]
             WHEN 2 THEN ($fl)[CAST((doc_id // 4) % ${fluent.size} AS INT) + 1]
             ELSE ($no)[CAST((doc_id // 4) % ${noisy.size} AS INT) + 1]
           END AS text
         FROM documents"""
  }

  /** Spark-side (lm_q, n_grams) struct: lower → script-aware tokens →
    * single-space join → fused kernel (one shuffle-free scan).
    */
  private def lm(text: Column) =
    NgramLmScore(concat_ws(" ", Tok.words(text)), model)

  /** ppl_q from (lm_q, n_grams): truncating div on the non-negative
    * decomposition (lm_q ≤ 0 always) — Spark `div` ≡ DuckDB `//` here.
    */
  private val pplExpr = expr(
    s"CAST(CASE WHEN n_grams = 0 THEN 0 " +
      s"ELSE -((-lm_q) * ${model.scale} div n_grams) END AS BIGINT)")

  /** Bucket from ppl_q under the fixed model thresholds. */
  private def bucketCol(ppl: Column): Column =
    when(ppl < tLo, "tail").when(ppl < tHi, "middle").otherwise(lit("head"))

  private def bucketSql(pplCol: String): String =
    s"CASE WHEN $pplCol < $tLo THEN 'tail' " +
      s"WHEN $pplCol < $tHi THEN 'middle' ELSE 'head' END"

  /** q222: per-doc exact-integer LM score — total quantized log-prob,
    * trigram-window count, and the per-gram scaled average. The oracle
    * replays the smoothed backoff relationally (unnest windows → two
    * left joins against the generated (gram, qlp) tables → sum).
    */
  val q222LmPerplexity = Q(
    "q222_lm_perplexity",
    (s, dir) => {
      val r = lm(col("text"))
      mixedDocs(s, dir)
        .select(col("doc_id"),
          r.getField("lm_q").as("lm_q"),
          r.getField("n_grams").as("n_grams"))
        .withColumn("ppl_q", pplExpr)
    },
    Some(NgramLm.scoredSql(model, mixedDocsSql) + """
      SELECT doc_id, lm_q, n_grams, ppl_q FROM lm_doc"""))

  /** q223: head/middle/tail mixture stats under the fixed thresholds —
    * per bucket: doc count, total trigram mass, and the exact ppl_q
    * range. Pure map + one tiny groupBy: the 100 TB shape.
    */
  val q223LmBuckets = Q(
    "q223_lm_buckets",
    (s, dir) => {
      val r = lm(col("text"))
      mixedDocs(s, dir)
        .select(col("doc_id"),
          r.getField("lm_q").as("lm_q"),
          r.getField("n_grams").as("n_grams"))
        .withColumn("ppl_q", pplExpr)
        .withColumn("bucket", bucketCol(col("ppl_q")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_grams").as("total_grams"),
          min("ppl_q").as("min_ppl_q"),
          max("ppl_q").as("max_ppl_q"))
    },
    Some(NgramLm.scoredSql(model, mixedDocsSql) + s"""
      SELECT ${bucketSql("ppl_q")} AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_grams) AS BIGINT) AS total_grams,
             min(ppl_q) AS min_ppl_q,
             max(ppl_q) AS max_ppl_q
      FROM lm_doc
      GROUP BY 1"""))

  /** q224: the five-stage curation funnel KEYED ON THE PERPLEXITY
    * BUCKET (the verdict's "funnel variant") — quality → exact dedup →
    * LSH → decontamination → token budget, with lang := bucket and the
    * q221 size-adaptive eval split (so the decontamination manifest
    * stays live at every SF).
    */
  val q224CurationLmBucket = Q(
    "q224_curation_lmbucket",
    (s, dir) => {
      val r = lm(col("text"))
      val docs = mixedDocs(s, dir)
        .select(col("doc_id"),
          r.getField("lm_q").as("lm_q"),
          r.getField("n_grams").as("n_grams"),
          col("text"))
        .withColumn("ppl_q", pplExpr)
        .select(col("doc_id"), bucketCol(col("ppl_q")).as("lang"), col("text"))
      PipelineQueries.curationPipeline(docs,
        PipelineQueries.hashEvalPred(PipelineQueries.nDocuments(s, dir)))
    },
    Some(PipelineQueries.curationOracleSql(
      NgramLm.scoredSql(model, mixedDocsSql) + s"""
        SELECT doc_id, ${bucketSql("ppl_q")} AS lang, text FROM lm_doc""",
      PipelineQueries.hashEvalPredSql)))

  val qs: Seq[Q] = Seq(q222LmPerplexity, q223LmBuckets, q224CurationLmBucket)
}

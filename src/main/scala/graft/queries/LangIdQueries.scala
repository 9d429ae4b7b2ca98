package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, Tok}
import graft.functions.LangIdScores
import graft.operators.{LangId, LangIdModel}

/** Language identification through the TRAINED-ARTIFACT seam (r18
  * verdict top item): the fastText-shape hash-feature linear model
  * (operators/LangId.scala) gated with exact-integer scores at every
  * SF, and composed into the curation DAG so the per-lang funnel keys
  * on the PREDICTED language — the production posture (a real corpus
  * does not arrive with a trusted lang column).
  *
  * Reference anchor: the reference's per-corpus curation keys work on
  * dataset language metadata (its pipelines partition assets per
  * dataset); an engine ingesting raw web text must derive that key.
  */
object LangIdQueries {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The model every query (and its generated oracle) shares: trained
    * once per JVM, round-tripped through the binary artifact.
    */
  private lazy val model: LangIdModel = LangId.fixture

  /** Spark-side (pred, scores) struct over a text column: lower →
    * script-aware tokens → single-space join → fused kernel.
    */
  private def lid(text: org.apache.spark.sql.Column) =
    LangIdScores(concat_ws(" ", Tok.words(text)), model)

  /** Oracle fragments over a docs relation exposing (doc_id, text):
    * w = token list, s = joined stream, fix = feature indices,
    * s0..s{n-1} = scores, pred. Kept as ONE generated chain so the two
    * engines' arithmetic can never drift (the never-hand-copy rule).
    */
  private def scoredSql(docsSql: String): String = {
    val m = model
    val scoreCols = m.langs.indices.map(l => s"s$l")
    val scoreExprs = m.langs.indices
      .map(l => s"${LangId.scoreSql(m, l, "fix")} AS s$l")
      .mkString(",\n               ")
    s"""
      WITH lid_docs AS MATERIALIZED ($docsSql),
      lid_wts AS MATERIALIZED (${LangId.weightsSql(m)}),
      lid_w AS (
        SELECT *, ${Tok.sqlWords("text")} AS w FROM lid_docs),
      lid_s AS (
        SELECT *, array_to_string(w, ' ') AS s FROM lid_w),
      lid_fix AS (
        SELECT *, ${LangId.fixSql("w", "s", m.d)} AS fix FROM lid_s),
      lid_scored AS (
        SELECT f.*, $scoreExprs
        FROM lid_fix f CROSS JOIN lid_wts),
      lid_pred AS (
        SELECT *, ${LangId.predSql(m, scoreCols)} AS pred
        FROM lid_scored)"""
  }

  /** q216: classify the held-out multilingual corpus — each doc is a
    * NEVER-TRAINED-ON sentence of a planted language (doc_id picks the
    * sentence), so the gate exercises real multi-class prediction, and
    * the oracle replays the full feature → score → argmax arithmetic
    * exactly. `is_match` pins classifier ACCURACY (all true on held-out
    * text), not just replay equality.
    */
  val q216LangId = Q(
    "q216_lang_id",
    (s, dir) => {
      val ev = LangId.evalExamples
      val langsArr = array(ev.map(e => lit(e._1)): _*)
      val textsArr = array(ev.map(e => lit(e._2)): _*)
      val ix = (col("doc_id") % ev.size).cast("int") + 1
      val docs = t(s, dir)("documents")
        .select(col("doc_id"), element_at(langsArr, ix).as("planted"),
          element_at(textsArr, ix).as("text"))
      val r = lid(col("text"))
      val withLid = docs.select(col("doc_id"), col("planted"),
        r.getField("pred").as("pred"), r.getField("scores").as("sc"))
      withLid.select(
        col("doc_id") +: col("planted") +: col("pred") +:
          (col("pred") === col("planted")).as("is_match") +:
          model.langs.indices.map(l =>
            element_at(col("sc"), l + 1).as(s"s_${model.langs(l)}")): _*)
    },
    Some {
      val ev = LangId.evalExamples
      val langsArr = ev.map(e => s"'${e._1}'").mkString("[", ", ", "]")
      val textsArr = ev.map(e => s"'${e._2}'").mkString("[", ", ", "]")
      val scoreAliases = model.langs.zipWithIndex
        .map { case (lang, l) => s"s$l AS s_$lang" }.mkString(", ")
      scoredSql(
        s"""SELECT doc_id,
               ($langsArr)[CAST(doc_id % ${ev.size} AS INT) + 1] AS planted,
               ($textsArr)[CAST(doc_id % ${ev.size} AS INT) + 1] AS text
             FROM documents""") + s"""
      SELECT doc_id, planted, pred, pred = planted AS is_match, $scoreAliases
      FROM lid_pred"""
    })

  /** q217: the q214 curation DAG (quality → exact → LSH → decontam →
    * token budget) over the CJK-suffixed corpus with the lang column
    * REPLACED BY THE CLASSIFIER'S PREDICTION — the funnel keyed by
    * predicted language end to end. The oracle recomputes the
    * prediction inside the docs relation and replays the identical
    * five-stage pipeline (curationOracleSql unchanged).
    */
  val q217CurationPredLang = Q(
    "q217_curation_predlang",
    (s, dir) => {
      // train-side-only suffix — the q214 corpus rule (eval split is an
      // external plain-text set; see q214's scaladoc for the r19 find);
      // since r20 the split is the size-adaptive hashEvalPred (the
      // fixed %199 form was vacuous at sf1)
      val sn = array(TextOps.unicodeSnippets.map(lit): _*)
      val raw = t(s, dir)("documents")
      val ev = PipelineQueries.hashEvalPred(
        PipelineQueries.nDocuments(s, dir))
      val suffixed = raw
        .select(col("doc_id"),
          when(ev, col("text"))
            .otherwise(concat(col("text"), lit(" "),
              element_at(sn, (col("doc_id") % 5).cast("int") + 1)))
            .as("text"))
      val r = lid(col("text"))
      PipelineQueries.curationPipeline(
        suffixed.select(col("doc_id"), r.getField("pred").as("lang"),
          col("text")),
        ev)
    },
    Some {
      val docsSql = scoredSql(
        s"SELECT doc_id, CASE WHEN ${PipelineQueries.hashEvalPredSql} " +
          "THEN text ELSE " +
          "text || ' ' || (" + TextOps.unicodeSnippetSqlArray +
          ")[CAST(doc_id % 5 AS INT) + 1] END AS text FROM documents") + """
      SELECT doc_id, pred AS lang, text FROM lid_pred"""
      PipelineQueries.curationOracleSql(docsSql,
        PipelineQueries.hashEvalPredSql)
    })

  val qs: Seq[Q] = Seq(q216LangId, q217CurationPredLang)
}

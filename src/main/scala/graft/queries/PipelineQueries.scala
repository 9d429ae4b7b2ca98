package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Composed training-data corpus pipeline + sketch surface. */
object PipelineQueries {

  /** The canonical pretraining-corpus pass, composed end-to-end: quality
    * gate → exact dedup → MinHash near-dup dedup → per-language corpus
    * stats. MinHash step → rows-only check (xxhash64 has no DuckDB
    * equivalent); each stage is individually oracle-checked by
    * q32/q34/q37.
    */
  val q39CorpusPipeline = Q(
    "q39_corpus_pipeline",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = split(col("text"), " ", -1)
      // quality gate (q32 semantics, keep+review)
      val quality = docs.withColumn("n_tokens", size(toks).cast("double"))
        .withColumn("diversity",
          size(array_distinct(toks)).cast("double") / col("n_tokens"))
        .withColumn("quality",
          least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 + col("diversity") * 0.5)
        .filter(col("quality") >= 0.3)
      // exact dedup: survivor = min doc_id per digest
      val exact = quality
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).drop("rn")
      // near-dup dedup
      val deduped = Dedup.minhashDedup(exact, "doc_id", "text", threshold = 0.8)
      deduped.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(avg("quality"), 4).as("avg_quality"))
    },
    None,
    headline = true)

  /** Sketch aggregates (the approx fast path the reference lacks):
    * HyperLogLog distinct counts + quantile sketches. Sketch internals
    * are engine-specific → rows-only check; exact counterparts are
    * oracle-checked in q01/q18.
    */
  val q43Sketches = Q(
    "q43_sketches",
    (s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("approx_median_price"))
    },
    None)

  val qs: Seq[Q] = Seq(q39CorpusPipeline, q43Sketches)
}

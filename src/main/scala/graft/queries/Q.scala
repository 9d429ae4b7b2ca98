package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan plus (when SQL-expressible) a DuckDB
  * oracle over the same parquet tables. `headline=true` marks queries the
  * Bench harness times at sf0.1.
  *
  * HEADLINE-PROMOTION CHECKLIST (r20/r21): Bench's session raises
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` to 65536
  * — an execution mode the oracle-checked Verify session deliberately
  * does NOT run under. Before promoting a query whose plan contains an
  * ObjectHashAggregate (collect_list/collect_set, percentile, typed
  * Aggregators), confirm BOTH: (1) its agg buffers are order-insensitive
  * within a group (hash mode and the sort fallback can feed rows in
  * different orders), and (2) hash-mode memory is safe — bounded-sketch
  * buffers cost groups × buffer bytes in hash mode (q43's KMV buffers
  * OOM'd an 8g heap at sf0.1 under the floor; value-accumulating
  * buffers like collect_list cost the partition's own bytes either way).
  * Re-run one Verify pass with SPARK_GRAFT_CONF setting the floor when
  * in doubt.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  /** Ordered union of all query batches. */
  def all: Seq[Q] =
    Relational.qs ++ TextOps.qs ++ EventOps.qs ++ VectorOps.qs ++
      FloodQueries.qs ++ DedupQueries.qs ++ SpatialQueries.qs ++
      PipelineQueries.qs ++ BpeQueries.qs ++ CorpusStats.qs ++
      GraphQueries.qs ++ LangIdQueries.qs ++ NgramLmQueries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def headlines: Seq[Q] = all.filter(_.headline)
}

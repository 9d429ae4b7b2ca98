package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan plus (when SQL-expressible) a DuckDB
  * oracle over the same parquet tables. `headline=true` marks queries the
  * Bench harness times at sf0.1.
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

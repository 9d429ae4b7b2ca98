package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries are parameterized by an `sfDir` so the same plan runs
  * at any scale factor; at cluster scale the paths would be object-store
  * URIs and partition-pruned directories instead of single files
  * (reference: io_managers.py:155-169 multi-path parquet union).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores INT64 TIMESTAMP(NANOS); Spark has no nanos
      // timestamp — read as long nanos, truncate to micros (exactly what
      // DuckDB/pyarrow do when down-casting) and restore TimestampType.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Multi-path union scan (SURVEY S1/U3): one read, N files. */
  def loadMany(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}

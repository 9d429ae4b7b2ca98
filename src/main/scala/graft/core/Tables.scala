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
      // Historically events.parquet stored INT64 TIMESTAMP(NANOS); newer
      // drops regenerate it as TIMESTAMP_MICROS. Spark has no nanos
      // timestamp, so enable nanosAsLong (a no-op for micros files) and
      // branch on the dtype the scan actually produced: long nanos are
      // truncated to micros (exactly what DuckDB/pyarrow do when
      // down-casting), native timestamps pass through unchanged.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Naive micros: interpret as UTC instants (sessions run with
          // spark.sql.session.timeZone=UTC, so this cast is epoch-exact
          // and matches DuckDB's naive read of the same file).
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Multi-path union scan (SURVEY S1/U3): one read, N files. */
  def loadMany(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}

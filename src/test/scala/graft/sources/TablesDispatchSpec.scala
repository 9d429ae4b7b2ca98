package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{SchemaDriftException, Tables}

/** The branch-or-fail-loudly posture of Tables.load (round-9 lesson: the
  * driver regenerated events.parquet with a new timestamp dtype and every
  * events query silently erred). Each test feeds load() a re-typed parquet
  * and asserts either the documented dispatch or a NAMED loud error.
  */
class TablesDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("tables_dispatch")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("events.ts as INT64 nanos dispatches to micros timestamps") {
    val dir = tmpDir()
    // 2021-01-01T00:00:00.123456789 as nanos
    val nanos = 1609459200L * 1000000000L + 123456789L
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val micros = got.select(unix_micros(col("ts"))).as[Long].head()
    assert(micros == nanos / 1000, s"nanos truncated wrong: $micros")
  }

  test("events.ts as TIMESTAMP_NTZ dispatches to UTC instants") {
    val dir = tmpDir()
    Seq((1L, java.time.LocalDateTime.parse("2021-01-01T00:00:00.123456"),
      7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val micros = got.select(unix_micros(col("ts"))).as[Long].head()
    assert(micros == 1609459200L * 1000000L + 123456L)
  }

  test("documents.doc_id drifting to int fails loudly naming the column") {
    val dir = tmpDir()
    Seq((1, "some text", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[SchemaDriftException] {
      Tables.load(spark, dir, "documents")
    }
    assert(e.getMessage.contains("documents.doc_id"), e.getMessage)
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }

  test("embeddings.embedding drifting to array<double> fails loudly") {
    val dir = tmpDir()
    Seq((1L, Array(0.1, 0.2), 3))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[SchemaDriftException] {
      Tables.load(spark, dir, "embeddings")
    }
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }

  test("a dropped critical column fails loudly as MISSING") {
    val dir = tmpDir()
    Seq((1L, "text only")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[SchemaDriftException] {
      Tables.load(spark, dir, "documents")
    }
    assert(e.getMessage.contains("MISSING"), e.getMessage)
  }

  test("every real testdata table passes the schema contract") {
    Tables.All.foreach { t =>
      Tables.load(spark, "/root/testdata/sf0.001", t).schema
    }
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q119 funnel totality on fixtures where a stage is EMPTY.
  *
  * Spark's `groupBy(stage).count()` over zero rows emits zero rows, while
  * the DuckDB oracle's unconditional `SELECT '3_purchase', count(*)` emits
  * a count-0 row — a latent gate divergence at any SF/fixture where a
  * funnel stage has no converting users (r7 advice). The query builds each
  * stage count with a global agg + lit() stage column, which always emits
  * exactly one row; this spec pins that on an events fixture with zero
  * purchases and on one with zero events at all.
  */
class FunnelEmptyStageSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Long, String, Long)]): String = {
    val d = Files.createTempDirectory("graft-funnel").toFile
    d.deleteOnExit()
    // ts is INT64 nanos, exactly the driver fixture's physical type —
    // Tables.load truncates to micros and restores TimestampType.
    // value/props fill out the full events schema contract (Tables.verify
    // fails loudly on any missing critical column, even in test fixtures).
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/events.parquet")
    d.getAbsolutePath
  }

  test("a stage with no users emits a count-0 row, like the oracle") {
    val base = 1700000000L * 1000000000L
    val dir = writeEvents(Seq(
      (1L, 10L, "view", base),
      (2L, 10L, "click", base + 60L * 1000000000L),
      (3L, 11L, "view", base + 2L * 1000000000L)))
    val got = Registry.queries("q119_funnel")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1_view" -> 2L, "2_click" -> 1L, "3_purchase" -> 0L))
  }

  test("an empty events table still emits all three stage rows at 0") {
    val dir = writeEvents(Seq.empty)
    val got = Registry.queries("q119_funnel")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got ==
      Map("1_view" -> 0L, "2_click" -> 0L, "3_purchase" -> 0L))
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("hourlyCounts aggregates a bounded stream by hour and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 2.0),
      Event(3, ts(65), 7, "view", 5.0))
    val q = hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "n", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize opens a new session after a 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(5), 7, "view", 1.0),   // same session
      Event(3, ts(50), 7, "click", 1.0), // gap 45 min → new session
      Event(4, ts(0), 8, "view", 1.0))   // other user
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[UserSessions].collect().map(u => u.user_id -> u.n_sessions).toMap
      assert(rows == Map(7L -> 2L, 8L -> 1L))
    } finally q.stop()
  }

  test("sessionize carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(1, ts(0), 9, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(90), 9, "click", 1.0)) // next batch, gap > 30
      q.processAllAvailable()
      val last = spark.table("sessions2").as[UserSessions].collect()
        .filter(_.user_id == 9L).maxBy(_.n_sessions)
      assert(last.n_sessions == 2L)
    } finally q.stop()
  }

  test("sessionizeExpiring closes sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionizeExpiring(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("expiring")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(5), 7, "view", 1.0))
      q.processAllAvailable()
      // session still open: nothing emitted yet
      assert(spark.table("expiring").count() == 0)
      // much later event from ANOTHER user advances the watermark far past
      // user 7's timeout → the open session closes and its state drops
      input.addData(Event(3, ts(600), 8, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(601), 8, "view", 1.0)) // one more batch to flush timeouts
      q.processAllAvailable()
      val closed = spark.table("expiring").as[SessionClosed].collect()
      assert(closed.exists(s => s.user_id == 7L && s.n_events == 2L &&
        s.start_us == ts(0).getTime * 1000L && s.end_us == ts(5).getTime * 1000L))
    } finally q.stop()
  }

  test("hourlyCounts drops events arriving later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = input.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(0), 7, "click", 1.0))
      q.processAllAvailable()
      // advance watermark well past the first hour (ts(600) = +10h)
      input.addData(Event(2, ts(600), 7, "view", 1.0))
      q.processAllAvailable()
      // late event for the long-closed first hour: must be dropped
      input.addData(Event(3, ts(1), 7, "click", 1.0))
      q.processAllAvailable()
      // close the second window so its row flushes too
      input.addData(Event(4, ts(695), 7, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late")
        .as[(java.sql.Timestamp, String, Long)].collect()
      val firstHour = rows.filter(_._2 == "click")
      assert(firstHour.map(_._3).sum == 1L) // late click NOT counted
    } finally q.stop()
  }

  test("streaming parquet sink writes exactly-once batches with checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "view", 2.0))
    val q = input.toDF()
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(3, ts(20), 8, "click", 3.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
        .select("event_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L))
    } finally {
      q.stop()
      graft.sources.FsOps.delete(spark, dir)
    }
  }

  test("dedupWithinWatermark drops duplicate keys inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(1, ts(1), 7, "click", 1.0), // duplicate event_id
      Event(2, ts(2), 7, "view", 1.0))
    val q = dedupWithinWatermark(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(1, ts(3), 7, "click", 1.0)) // still inside horizon
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("clickAttribution joins purchases to preceding-hour clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(30), 7, "purchase", 9.0),  // click 30 min before → match
      Event(3, ts(0), 8, "purchase", 5.0),   // user 8 never clicked
      Event(4, ts(10), 9, "purchase", 2.0),
      Event(5, ts(20), 9, "click", 1.0))     // click AFTER purchase → no match
    val q = clickAttribution(input.toDF(), maxLagMinutes = 60)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("event_id", "user_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 7L)))
    } finally q.stop()
  }

  test("clickAttributionOuter null-extends unmatched purchases after the " +
      "watermark passes, and flush sentinels drive the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(30), 7, "purchase", 9.0),  // matched
      Event(3, ts(0), 8, "purchase", 5.0))   // unmatched → null row
    val q = clickAttributionOuter(input.toDF(), maxLagMinutes = 60)
      .writeStream.format("memory").queryName("oattrib")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // matched row emits immediately; the unmatched one must NOT have
      // emitted yet (watermark still behind its window)
      val early = spark.table("oattrib")
        .select("event_id").as[Long].collect().toSet
      assert(early == Set(2L))
      // sentinel batch 1 advances the watermark (flush passes the side
      // filters by design); batch 2's state cleanup emits the null row
      input.addData(Event(-5, ts(10 * 86400), -5, "flush", 0.0))
      q.processAllAvailable()
      input.addData(Event(-6, ts(20 * 86400), -6, "flush", 0.0))
      q.processAllAvailable()
      val rows = spark.table("oattrib")
        .filter("event_id >= 0")
        .select("event_id", "click_ts").as[(Long, Option[java.sql.Timestamp])]
        .collect().toMap
      assert(rows.keySet == Set(2L, 3L))
      assert(rows(2L).contains(ts(0)))
      assert(rows(3L).isEmpty)
    } finally q.stop()
  }

  test("asofPurchases attaches the most recent prior click") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "purchase", 9.0),
      Event(3, ts(20), 7, "click", 1.0),
      Event(4, ts(30), 7, "purchase", 9.0),
      Event(5, ts(5), 8, "purchase", 9.0)) // no prior click
    val q = asofPurchases(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("asof").as[PurchaseWithClick].collect()
        .map(p => p.event_id -> p.last_click_us).toMap
      assert(rows(2L).contains(ts(0).getTime * 1000L))
      assert(rows(4L).contains(ts(20).getTime * 1000L))
      assert(rows(5L).isEmpty)
    } finally q.stop()
  }
}

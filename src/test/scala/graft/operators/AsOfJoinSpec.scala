package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks the latest right row at or before each left ts") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 99.0),
      ("B", 15L, 50.0)).toDF("sym", "ts", "px")
    val quotes = Seq(
      ("A", 5L, 99.5), ("A", 20L, 100.5), ("A", 30L, 100.9),
      ("B", 99L, 51.0)).toDF("sym", "ts", "bid")
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts", Seq("bid"))
      .orderBy("sym", "ts")
      .as[(String, Long, Double, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("A", 10L, 100.0, Some(99.5)),   // quote@5
      ("A", 20L, 101.0, Some(100.5)),  // tie: quote@20 visible
      ("A", 35L, 99.0, Some(100.9)),   // quote@30
      ("B", 15L, 50.0, None)))         // no quote yet
  }

  test("as-of plan is one shuffle on the keys, no range join") {
    val l = Seq(("A", 1L, 1.0)).toDF("k", "ts", "v")
    val r = Seq(("A", 1L, 2.0)).toDF("k", "ts", "w")
    val plan = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("w"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"), plan)
  }

  test("matches q54's semantics on the events shape") {
    val events = Seq(
      (1L, 7L, "click", 100L), (2L, 7L, "purchase", 150L),
      (3L, 7L, "click", 200L), (4L, 7L, "purchase", 200L),
      (5L, 8L, "purchase", 50L)).toDF("event_id", "user_id", "event_type", "us")
    val purchases = events.filter($"event_type" === "purchase")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"us", $"us".as("click_us"))
    val got = AsOfJoin.backward(purchases, clicks, Seq("user_id"), "us", "us",
      Seq("click_us"))
      .select("event_id", "asof_click_us")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(2L -> Some(100L), 4L -> Some(200L), 5L -> None))
  }
}

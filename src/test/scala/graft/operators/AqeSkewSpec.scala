package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the AQE-vs-SkewOps decision rule with executable evidence.
  *
  * Measured (SkewMacroBench, r7, local[32]): for a PURE sort-merge join
  * AQE's native skew split beats every salted form — 10M⋈1M: AQE 2.2 s
  * vs hot-key 4.4 s vs blanket 3.6 s vs plain 4.6 s; 20M⋈10M: AQE 4.0 s
  * vs hot-key 7.7 s vs blanket 15.2 s vs plain 6.6 s. So the rule:
  *
  *  1. Skewed SMJ whose output feeds no distribution-sensitive parent →
  *     plain join + AQE. Never salt.
  *  2. Skewed join followed by an op REQUIRING hash distribution on the
  *     join key (groupBy the same key) → AQE skips the split (splitting
  *     breaks the distribution; forcing it re-shuffles everything) →
  *     SkewOps.saltedJoin/saltedJoinHotKeys.
  *  3. Skewed AGGREGATION state (one hot group key) → AQE has no
  *     mechanism at all → SkewOps.saltedAggregate.
  *
  * The tests below prove the mechanism claims behind rules 1 and 2 on
  * the executed plan itself, with thresholds tuned so skew handling
  * triggers at test scale.
  */
class AqeSkewSpec extends SparkSpec {

  private def withSkewAqe[A](force: Boolean)(body: => A): A = {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(c.get(k)).toOption)
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", force.toString)
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  // one dominant key (half the rows on k=0) against a per-key right side
  private def skewed = {
    val left = spark.range(20000).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(100))).as("k"),
      col("id").as("lv"))
    val right = spark.range(100).select(
      col("id").as("k"), (col("id") * 3).as("rv"))
    (left, right)
  }

  test("rule 1: AQE splits a skewed pure SMJ natively (skew=true in plan)") {
    withSkewAqe(force = false) {
      val (l, r) = skewed
      val df = l.join(r, "k")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
    }
  }

  test("rule 2: a groupBy on the join key blocks the split — SkewOps territory") {
    withSkewAqe(force = false) {
      val (l, r) = skewed
      val df = l.join(r, "k").groupBy("k")
        .agg(sum(col("lv") + col("rv")).as("s"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"expected AQE to skip the skew split under a same-key groupBy:\n$plan")
    }
  }

  test("rule 2 corollary: forcing the split re-introduces a shuffle") {
    withSkewAqe(force = true) {
      val (l, r) = skewed
      val base = l.join(r, "k").groupBy("k")
        .agg(sum(col("lv") + col("rv")).as("s"))
      base.collect()
      val plan = base.queryExecution.executedPlan.toString
      // the forced variant pays an extra exchange AFTER the join to
      // restore hash distribution for the aggregation — the cost that
      // makes salting competitive in this shape
      assert(plan.contains("skew=true"), plan)
      val joinIdx = plan.indexOf("SortMergeJoin")
      val exchangeAfter = plan.lastIndexOf("Exchange hashpartitioning", joinIdx)
      assert(exchangeAfter >= 0,
        s"expected a post-join re-shuffle when the split is forced:\n$plan")
    }
  }

  test("salted forms stay row-identical to the plain join on skewed input") {
    val (l, r) = skewed
    val expect = l.join(r, "k").agg(sum(col("lv") + col("rv"))).collect()(0).getLong(0)
    val blanket = SkewOps.saltedJoin(l, r, "k", 4)
      .agg(sum(col("lv") + col("rv"))).collect()(0).getLong(0)
    val hot = SkewOps.saltedJoinHotKeys(l, r, "k", 4, 1000)
      .agg(sum(col("lv") + col("rv"))).collect()(0).getLong(0)
    assert(blanket == expect && hot == expect)
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("two-pass running sum equals the single-reducer window exactly") {
    val df = spark.range(10000).select(
      col("id").as("k"),
      (pmod(xxhash64(col("id")), lit(50)) + 1).as("v"))
    val got = PrefixSum.runningSum(df, Seq(col("k")), col("v"), "cum", 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got.size == 10000 && got == want)
  }

  test("stable across re-evaluation of the same returned DataFrame") {
    val df = spark.range(5000).select(col("id").as("k"), lit(3L).as("v"))
    val out = PrefixSum.runningSum(df, Seq(col("k")), col("v"), "cum", 8)
    val a = out.agg(sum("cum")).head().getLong(0)
    val b = out.agg(sum("cum")).head().getLong(0)
    assert(a == b)
    // closed form: sum of 3i for i in 1..5000
    assert(a == 3L * 5000L * 5001L / 2)
  }

  test("offsets survive a downstream coalesce(1) — the single-file dump path") {
    // regression: TaskContext-based partition ids collapse to 0 under a
    // downstream coalesce, zeroing every partition's offset (caught by
    // the q111 Verify dump); parent-index mapPartitionsWithIndex must not
    val df = spark.range(10000).select(col("id").as("k"), lit(2L).as("v"))
    val got = PrefixSum.runningSum(df, Seq(col("k")), col("v"), "cum", 8)
      .coalesce(1)
      .select("k", "cum").as[(Long, Long)].collect()
    assert(got.length == 10000 && got.forall { case (k, c) => c == 2 * (k + 1) })
  }

  test("no lingering CacheManager entry after runningSum returns") {
    // the staged range-partitioned copy is cache()d for the two passes but
    // must be unpersisted before return — otherwise every call site pins a
    // materialized copy for the session (r7 judge/advice item) and the
    // lingering entries become a cross-query cache-substitution surface
    // for the plan-hash protocol
    spark.sharedState.cacheManager.clearCache()
    val df = spark.range(4000).select(col("id").as("k"), lit(1L).as("v"))
    val out = PrefixSum.runningSum(df, Seq(col("k")), col("v"), "cum", 8)
    assert(spark.sharedState.cacheManager.isEmpty,
      "runningSum left a cached plan registered in the CacheManager")
    // and the returned frame is still correct + stable after the unpersist
    assert(out.agg(sum("cum")).head().getLong(0) == 4000L * 4001L / 2)
  }

  test("multi-column order key (source, id) keeps source blocks contiguous") {
    val df = spark.range(2000).select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
      col("id").as("k"), lit(1L).as("v"))
    val cum = PrefixSum.runningSum(
      df, Seq(col("source"), col("k")), col("v"), "cum", 8)
    // within each source the running sum restarted from its base must be
    // exactly 1..n in k order
    val perSource = cum.groupBy("source")
      .agg(min(col("cum") - col("v")).as("base"))
    val got = cum.join(perSource, "source")
      .select(col("source"), col("k"), (col("cum") - col("base")).as("r"))
    val bad = got.join(
      got.select(col("source"), col("k"),
        row_number().over(Window.partitionBy("source").orderBy("k"))
          .cast("long").as("expect")),
      Seq("source", "k"))
      .filter(col("r") =!= col("expect")).count()
    assert(bad == 0)
  }
}

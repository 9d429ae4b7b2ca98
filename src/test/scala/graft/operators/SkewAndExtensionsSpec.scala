package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewAndExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals the direct aggregate on a skewed key") {
    // one hot key (90% of rows) + long tail
    val df = ((1 to 900).map(_ => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", 2.0))).toDF("k", "v").repartition(8)
    val got = SkewOps.saltedAggregate(df, Seq("k"), salt = 16,
      partial = Seq("cnt" -> count(lit(1)), "sum_v" -> sum("v")),
      fin = Seq("cnt" -> (c => sum(c).cast("long")), "sum_v" -> (c => sum(c))))
      .orderBy("k").collect()
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .orderBy("k").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("saltedJoin equals the plain join on a skewed key") {
    val left = ((1 to 500).map(_ => ("hot", 1)) ++ Seq(("cold", 2))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("cold", 20)).toDF("k", "rv")
    val got = SkewOps.saltedJoin(left, right, "k", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("cold", 1L, 20L), ("hot", 500L, 5000L)))
  }

  test("saltedJoinHotKeys replicates ONLY hot keys and equals the plain join") {
    // one hot key (90% of rows) + 100 cold keys; threshold 100 isolates it
    val left = ((1 to 900).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "lv").repartition(8)
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .map(k => (k, s"name_$k")).toDF("k", "rv")
    // pin the frequency split: exactly the hot key crosses the threshold,
    // so ONLY it takes the salted (replicated) path
    val hot = SkewOps.hotKeys(left, "k", threshold = 100L)
      .as[String].collect().toSeq
    assert(hot == Seq("hot"))
    val got = SkewOps.saltedJoinHotKeys(left, right, "k", salt = 8,
        hotThreshold = 100L)
      .groupBy("k").agg(count(lit(1)).as("n"), min("rv").as("r"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val want = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), min("rv").as("r"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(got == want)
    // rows on both paths: hot path carries 900, cold path 100
    assert(got.map(_(1).asInstanceOf[Long]).sum == 1000L)
  }

  test("GraftExtensions registers pandas_float_str for SQL use") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT pandas_float_str(CAST(2.45 AS DOUBLE), 3) AS a," +
        " pandas_float_str(CAST(-18.0 AS DOUBLE), 3) AS b")
      .collect()(0)
    assert(got.getString(0) == "2.45" && got.getString(1) == "-18.0")
  }

  test("CollapseRedundantRound removes the redundant outer round") {
    def q = spark.range(1, 8)
      .select(round(round(col("id") / 7.0, 3), 5).as("x"),
        round(bround(col("id") * 0.045, 3), 3).as("y"))
    def countRound(p: String): Int =
      "round\\(".r.findAllIn(p.toLowerCase).length
    // baseline WITHOUT the rule: results + round() count in the plan
    val plain = q.collect().map(_.toSeq).toSeq
    val plainCount = countRound(q.queryExecution.optimizedPlan.toString)
    spark.experimental.extraOptimizations =
      Seq(graft.plans.CollapseRedundantRound)
    try {
      val df = q
      // both outer rounds collapsed, semantics unchanged
      assert(countRound(df.queryExecution.optimizedPlan.toString) ==
        plainCount - 2)
      assert(df.collect().map(_.toSeq).toSeq == plain)
      // a FINER inner round must NOT be collapsed (double rounding differs:
      // round(round(0.045, 2), 1) = 0.1 but round(0.045, 1) = 0.0)
      val keep = spark.range(1, 2)
        .select(round(round(col("id") * 0.045, 2), 1).as("z"))
      assert(countRound(keep.queryExecution.optimizedPlan.toString) == 2)
      assert(keep.collect()(0).getDouble(0) == 0.1)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("partitioned parquet layout prunes partitions on read (S2 layout)") {
    val dir = Files.createTempDirectory("graft-part").toString
    (1 to 120).map(i => (i, (i % 30 + 1) * 24))
      .toDF("id", "leadtime_hour")
      .write.mode("overwrite").partitionBy("leadtime_hour")
      .parquet(s"$dir/discharge")
    val pruned = spark.read.parquet(s"$dir/discharge")
      .filter(col("leadtime_hour") === 24)
    assert(pruned.count() == 4)
    // partition pruning must reach the file index as a PartitionFilter
    // (not a post-scan data filter)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("leadtime_hour"))
    graft.sources.FsOps.delete(spark, dir)
  }
}

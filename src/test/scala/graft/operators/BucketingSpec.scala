package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: pre-shuffled table layout so repeated equi-joins/aggs on
  * the bucket key run with NO exchange — the co-located-join strategy for
  * recurring 100 TB joins (SURVEY §4: small-table strategy / manual
  * partition pruning row).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no Exchange") {
    // force the non-broadcast path: the point is that the SORT-MERGE join
    // of two bucketed tables needs no shuffle at all
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"left_$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_left")
      (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_right")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}

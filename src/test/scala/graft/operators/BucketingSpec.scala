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

  test("bucketedTable invalidates when the source data changes (staleness)") {
    val base = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val srcDir = s"$base/src"
    val tblDir = s"$base/tbl"
    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(srcDir)
    try {
      stage(Seq((1L, "old1"), (2L, "old2")))
      val first = graft.sources.Layout.bucketedTable(
        spark.read.parquet(srcDir), "bkt_stale", tblDir, 4, "k")
      assert(first.orderBy("k").as[(Long, String)].collect().toSeq ==
        Seq((1L, "old1"), (2L, "old2")))
      // rewrite the SOURCE under the same paths (new content, new files)
      stage(Seq((1L, "new1"), (2L, "new2"), (3L, "new3")))
      // simulate a fresh JVM: clear the per-JVM memo so the fingerprint
      // (not the in-memory guard) must make the call
      val f = graft.sources.Layout.getClass.getDeclaredField("written")
      f.setAccessible(true)
      f.get(graft.sources.Layout)
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap.KeySetView[String, _]]
        .remove("table:bkt_stale")
      val second = graft.sources.Layout.bucketedTable(
        spark.read.parquet(srcDir), "bkt_stale", tblDir, 4, "k")
      assert(second.orderBy("k").as[(Long, String)].collect().toSeq ==
        Seq((1L, "new1"), (2L, "new2"), (3L, "new3")),
        "changed source data must invalidate the cached bucketed table")
      // and an UNCHANGED source must NOT trigger a rewrite (fingerprint match)
      f.get(graft.sources.Layout)
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap.KeySetView[String, _]]
        .remove("table:bkt_stale")
      val fpFile = new java.io.File(s"$tblDir/_graft_fingerprint")
      val mtime = fpFile.lastModified()
      graft.sources.Layout.bucketedTable(
        spark.read.parquet(srcDir), "bkt_stale", tblDir, 4, "k").count()
      assert(fpFile.lastModified() == mtime,
        "unchanged source must reuse the existing table, not rewrite")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_stale")
      graft.sources.FsOps.delete(spark, base)
    }
  }
}

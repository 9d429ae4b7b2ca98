package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("denseGrid generates the descending-latitude GloFAS layout distributed") {
    val g = RasterContract.denseGrid(spark, latMax = 2.0, lonMin = 10.0,
      res = 0.5, nLat = 3, nLon = 2)
    val rows = g.orderBy(desc("latitude"), asc("longitude"))
      .as[(Double, Double)].collect().toSeq
    assert(rows == Seq((2.0, 10.0), (2.0, 10.5), (1.5, 10.0), (1.5, 10.5),
      (1.0, 10.0), (1.0, 10.5)))
  }

  test("concatEnsemble renumbers the control member to 0 and unions") {
    val cf = Seq((1, 5.0)).toDF("number", "dis24")
    val pf = Seq((1, 6.0), (2, 7.0)).toDF("number", "dis24")
    val out = RasterContract.concatEnsemble(cf, pf)
      .orderBy("number").as[(Int, Double)].collect().toSeq
    assert(out == Seq((0, 5.0), (1, 6.0), (2, 7.0)))
  }

  test("nanToNull normalizes NaN measures at the ingest boundary") {
    val df = Seq(1.0, Double.NaN, 3.0).toDF("dis24")
    val out = RasterContract.nanToNull(df, Seq("dis24"))
    assert(out.filter(col("dis24").isNull).count() == 1)
    assert(out.na.drop(Seq("dis24")).count() == 2)
  }

  test("JSON scan/sink round-trips metadata blobs (S8)") {
    val dir = Files.createTempDirectory("graft-json").toString
    val df = Seq((1L, "tile_a", "{\"cloud\":12}"), (2L, "tile_b", "{\"cloud\":88}"))
      .toDF("id", "tile", "props")
    df.write.mode("overwrite").json(s"$dir/meta")
    val back = spark.read.json(s"$dir/meta")
    assert(back.count() == 2)
    val cloud = back
      .withColumn("cloud", get_json_object(col("props"), "$.cloud").cast("int"))
      .orderBy("id").select("cloud").as[Int].collect().toSeq
    assert(cloud == Seq(12, 88))
    FsOps.delete(spark, dir)
  }

  test("FsOps glob/copy/exists/delete drive the Hadoop FS API (S10)") {
    val dir = Files.createTempDirectory("graft-fs").toString
    Seq((1, "a")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t1")
    val parts = FsOps.glob(spark, s"$dir/t1/*.parquet")
    assert(parts.nonEmpty)
    assert(FsOps.copy(spark, parts.head, s"$dir/copied.parquet"))
    assert(FsOps.exists(spark, s"$dir/copied.parquet"))
    assert(spark.read.parquet(s"$dir/copied.parquet").count() == 1)
    assert(FsOps.delete(spark, dir))
    assert(!FsOps.exists(spark, dir))
  }

  test("compactParquet merges small files, preserves rows, swaps atomically") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 40 tiny part files (the streaming-sink litter pattern)
    spark.range(4000).select(col("id"), (col("id") % 7).as("g"))
      .repartition(40).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
      .groupBy("g").count().collect().map(_.toString).sorted.toSeq
    val (nBefore, nAfter) =
      FsOps.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 40 && nAfter == 1, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
      .groupBy("g").count().collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(!FsOps.exists(spark, dir + "_compact_staging"))
    assert(!FsOps.exists(spark, dir + "_compact_old"))
  }

  test("compactParquet refuses hive-partitioned layouts loudly") {
    // a naive rewrite of a partitioned dir would flatten key=value
    // subdirectories into data columns, destroying layout + pruning —
    // the guard must fail BEFORE touching anything (r7 advice)
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    spark.range(100).select(col("id"), (col("id") % 3).as("g"))
      .write.partitionBy("g").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    val e = intercept[IllegalArgumentException] {
      FsOps.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("subdirectories"))
    // directory untouched: same rows, partition columns still pruned
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(!FsOps.exists(spark, dir + "_compact_staging"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Edge-case hardening: empty inputs (discharge.py:260-261 short-circuit),
  * documented tie-breaks, partition-count invariance of dedup.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val forecastSchema = StructType(Seq(
    StructField("number", IntegerType), StructField("latitude", DoubleType),
    StructField("longitude", DoubleType), StructField("issued_on", DateType),
    StructField("step", IntegerType), StructField("valid_for", DateType),
    StructField("dis24", DoubleType)))
  private val thresholdSchema = StructType(Seq(
    StructField("latitude", DoubleType), StructField("longitude", DoubleType),
    StructField("threshold_2y", DoubleType), StructField("threshold_5y", DoubleType),
    StructField("threshold_20y", DoubleType)))

  test("FloodPipeline.run on empty forecast yields empty outputs, no error") {
    val emptyF = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], forecastSchema)
    val emptyT = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], thresholdSchema)
    val (d, s) = FloodPipeline.run(emptyF, emptyT)
    assert(d.count() == 0 && s.count() == 0)
  }

  test("peakTiming breaks exact (condition, median) ties by lowest step") {
    // two steps with identical condition and median_dis
    val detailed = Seq(
      (1.0, 1.0, "2023-10-01", "2023-10-02", 5, 0.5, 0.1, 0.05, 1.0, 2.0, 50.0, 4.0, 5.0),
      (1.0, 1.0, "2023-10-01", "2023-10-05", 2, 0.5, 0.1, 0.05, 1.0, 2.0, 50.0, 4.0, 5.0))
      .toDF("latitude", "longitude", "issued_on", "valid_for", "step",
        "p_above_2y", "p_above_5y", "p_above_20y",
        "min_dis", "q1_dis", "median_dis", "q3_dis", "max_dis")
    val got = FloodOps.peakTiming(detailed).collect()(0)
    assert(got.getAs[Int]("peak_step") == 2)
  }

  test("minhashDedup result is invariant to input partitioning") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = (1L to 40L).map { i =>
      if (i % 5 == 0) (i, base) // planted duplicates of each other
      else (i, s"$base unique token${i} marker${i * 7} tail${i * 13}")
    }.toDF("doc_id", "text")
    val a = Dedup.minhashDedup(docs.repartition(1), "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    val b = Dedup.minhashDedup(docs.repartition(13), "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.contains(5L) && !a.contains(10L) && !a.contains(40L))
  }

  test("nearestGridJoin works without broadcasting the right side") {
    val left = Seq((1.025, 2.075, 7.0)).toDF("latitude", "longitude", "dis24")
    val right = Seq((1.025, 2.075, 300e6)).toDF("latitude", "longitude", "uparea")
    val out = GridOps.nearestGridJoin(left, right, 0.025, 0.025, 0.05,
      Seq("uparea"), broadcastRight = false)
    assert(out.select("uparea").as[Double].collect().toSeq == Seq(300e6))
  }

  test("denseZonalCount on pixels with no in-range years still yields the universe") {
    val px = Seq((10L, 0), (20L, 99)).toDF("basin", "year") // all out of range
    val out = GridOps.denseZonalCount(px, "basin", "year", 1, 2)
      .orderBy("basin", "year")
      .select("basin", "year", "tree_loss_incidents").as[(Long, Int, Long)]
      .collect().toSeq
    assert(out == Seq((10L, 1, 0L), (10L, 2, 0L), (20L, 1, 0L), (20L, 2, 0L)))
  }
}

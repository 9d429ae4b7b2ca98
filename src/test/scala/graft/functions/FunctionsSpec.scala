package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("PandasFloatString matches pandas astype(str) goldens") {
    val vals = Seq(-18.0, 16.95, 17.0, 2.45, 2.2, 2.25, 2.5, 3.9, -0.55, -0.5, 3.95,
      0.001, -0.001, 123.456, 0.0)
    val got = vals.toDF("v")
      .select(PandasFloatString(col("v"), 3).as("s"))
      .as[String].collect().toSeq
    assert(got == Seq("-18.0", "16.95", "17.0", "2.45", "2.2", "2.25", "2.5",
      "3.9", "-0.55", "-0.5", "3.95", "0.001", "-0.001", "123.456", "0.0"))
  }

  test("PandasFloatString rounds HALF_UP at the given scale") {
    val got = Seq(19.0750000024, 17.324999994, 2.4255).toDF("v")
      .select(PandasFloatString(col("v"), 3).as("s"))
      .as[String].collect().toSeq
    assert(got.take(2) == Seq("19.075", "17.325"))
  }

  test("PandasFloatString survives codegen inside a larger projection") {
    val got = spark.range(1, 4)
      .select(concat(lit("v="),
        PandasFloatString(col("id").cast("double") * 0.5, 3)).as("s"))
      .as[String].collect().toSeq
    assert(got == Seq("v=0.5", "v=1.0", "v=1.5"))
  }

  test("ExactQuantile Aggregator matches the reference quantile goldens") {
    // n=10 ensemble from test_transforms.py:4040-4050 → q1=38.75, median=70, q3=97.5
    val e1 = Seq(100.0, 50.0, 25.0, 75.0, 15.0, 105.0, 35.0, 65.0, 90.0, 120.0)
    val df = e1.toDF("dis24").repartition(3) // exercise the multi-partition merge
    val row = df.agg(
      ExactQuantile(0.25)(col("dis24")).as("q1"),
      ExactQuantile(0.5)(col("dis24")).as("med"),
      ExactQuantile(0.75)(col("dis24")).as("q3")).collect()(0)
    assert(row.getDouble(0) == 38.75 && row.getDouble(1) == 70.0 && row.getDouble(2) == 97.5)
  }

  test("ExactQuantile agrees with built-in percentile on grouped data") {
    val df = (1 to 101).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g").agg(
      ExactQuantile(0.25)(col("v")).as("a"),
      percentile(col("v"), lit(0.25)).as("b"))
      .select((col("a") === col("b")).as("eq")).as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("MinhashSignature matches the builtin xxhash64(h, j) formulation bit-for-bit") {
    val df = spark.range(200)
      .selectExpr("transform(sequence(0, cast(id % 7 as int)), i -> xxhash64(concat('s', id, '-', i))) AS shh")
    val got = df.select(MinhashSignature(col("shh"), 16).as("sig"))
    val want = df.selectExpr(
      "transform(sequence(0, 15), j -> array_min(transform(shh, h -> xxhash64(h, j)))) AS sig")
    assert(got.collect().map(_.getSeq[Long](0)).toSeq ==
      want.collect().map(_.getSeq[Long](0)).toSeq)
    // survives inside a larger codegen'd projection
    val inProj = df.select((element_at(MinhashSignature(col("shh"), 16), 1) + 0L).as("x"))
    assert(inProj.count() == 200)
  }

  test("KmvSketch estimates distinct counts within the expected error") {
    // 10k distinct ids hashed through the shared md5 hash; k=256 → ~6% σ
    val est = spark.range(10000)
      .withColumn("g", lit("a"))
      .groupBy("g")
      .agg(KmvSketch(256)(
        graft.operators.Dedup.md5Hash64(col("id").cast("string"))).as("est"))
      .select("est").as[Double].collect()(0)
    assert(math.abs(est - 10000) / 10000.0 < 0.25, s"estimate $est")
  }

  test("KmvSketch is exact below saturation and partition-invariant") {
    def run(parts: Int): Double = spark.range(100)
      .repartition(parts)
      .withColumn("g", lit("a"))
      .groupBy("g")
      .agg(KmvSketch(256)(
        graft.operators.Dedup.md5Hash64(col("id").cast("string"))).as("est"))
      .select("est").as[Double].collect()(0)
    assert(run(1) == 100.0) // < k distinct → exact count
    // merge is associative/dedup-ing: any partitioning gives the same value
    assert(run(7) == 100.0 && run(32) == 100.0)
  }

  test("KmvSketch matches the k-th-smallest-hash formula exactly") {
    val df = spark.range(5000)
      .select(graft.operators.Dedup.md5Hash64(col("id").cast("string")).as("h"))
    val kth = df.distinct().orderBy("h").limit(256)
      .orderBy(desc("h")).limit(1).as[Long].collect()(0)
    val want = 255.0 * math.pow(2, 60) / kth.toDouble
    val got = df.agg(KmvSketch(256)(col("h")).as("e")).as[Double].collect()(0)
    assert(got == want)
  }
}

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
}

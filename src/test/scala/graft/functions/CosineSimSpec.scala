package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("bit-identical to the aggregate(zip_with) composition on floats") {
    val df = spark.range(5000).select(
      expr("transform(sequence(0, 63), i ->" +
        " cast(pmod(xxhash64(id, i), 1000) / 250.0 - 2.0 as float))").as("a"),
      expr("transform(sequence(0, 63), i ->" +
        " cast(pmod(xxhash64(id + 1, i), 1000) / 250.0 - 2.0 as float))").as("b"))
    val bad = df.select(
        CosineSim(col("a"), col("b")).as("fast"),
        composed(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")) // exact double comparison
      .count()
    assert(bad == 0)
  }

  test("null inputs and length mismatch yield null") {
    val r = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f, 3.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f)), None))
      .toDF("a", "b")
      .select(CosineSim(col("a"), col("b")).as("c"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val a = Seq(3.0f, -1.0f, 2.5f)
    val b = Seq(1.5f, 4.0f, -2.0f)
    val viaEval = {
      import org.apache.spark.sql.catalyst.util.ArrayData
      CosineSim.cosine(
        ArrayData.toArrayData(a.map(_.toDouble).toArray),
        ArrayData.toArrayData(b.map(_.toDouble).toArray)).doubleValue()
    }
    val viaPlan = Seq((a, b)).toDF("a", "b")
      .select(CosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(viaEval == viaPlan)
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotLongSpec extends SparkSpec {
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (p, q) => p * q),
      lit(0L), (acc, v) => acc + v)

  test("equal to the aggregate(zip_with) composition on quantized longs") {
    val df = spark.range(5000).select(
      expr("transform(sequence(0, 63), i -> pmod(xxhash64(id, i), 40001) - 20000)")
        .as("a"),
      expr("transform(sequence(0, 63), i -> pmod(xxhash64(id + 1, i), 40001) - 20000)")
        .as("b"))
    val bad = df.select(
        DotLong(col("a"), col("b")).as("fast"),
        composed(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(bad == 0)
  }

  test("null inputs and length mismatch yield null") {
    val r = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L, 3L))),
      (None, Some(Seq(1L))),
      (Some(Seq(1L)), None))
      .toDF("a", "b")
      .select(DotLong(col("a"), col("b")).as("c"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("interpreted path agrees with a hand computation") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val d = DotLong.dot(
      ArrayData.toArrayData(Array(3L, -1L, 20000L)),
      ArrayData.toArrayData(Array(1L, 4L, -20000L)))
    assert(d.longValue() === 3L - 4L - 400000000L)
  }
}

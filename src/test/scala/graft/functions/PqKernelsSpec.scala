package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqKernelsSpec extends SparkSpec {
  import spark.implicits._

  // m=2 subspaces of 2 dims, k=3 codewords: flat layout = subspace-major
  private val cb = Array[Long](
    0, 0, /* m0 j0 */ 10, 0, /* m0 j1 */ 0, 10, /* m0 j2 */
    5, 5, /* m1 j0 */ 0, 0, /* m1 j1 */ 9, 9 /* m1 j2 */)

  test("PqEncode picks exact integer argmin with smaller-j ties") {
    val rows = Seq(
      (1L, Seq(9L, 1L, 8L, 8L)), // m0 → j1 (d 2 vs 82/130); m1 → j2 (2 vs 18/128)
      (2L, Seq(0L, 0L, 0L, 0L)), // m0 → j0; m1 → j1 (0+0 < 50/162)
      (3L, Seq(5L, 5L, 5L, 5L))) // m0: j0=50 j1=50 j2=50 → tie keeps j0
      .toDF("id", "v")
    val got = rows.select(col("id"),
        PqEncode(col("v"), typedlit(cb), 2, 3).as("c"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(got(0)._2 === Seq(1L, 2L))
    assert(got(1)._2 === Seq(0L, 1L))
    assert(got(2)._2 === Seq(0L, 0L))
  }

  test("AdcLookup sums the table entries for each subspace's code") {
    val tab = Array[Long](7, 11, 13, /* m0 */ 17, 19, 23 /* m1 */)
    val got = Seq((Seq(2L, 0L), 0)).toDF("c", "z")
      .select(AdcLookup(col("c"), typedlit(tab), 3).as("d"))
      .as[Long].head()
    assert(got === 13L + 17L)
  }

  test("kernels agree with the q157 relational shape on random vectors") {
    val m = 4; val k = 4; val ds0 = 4
    val cbR = Array.tabulate(m * k * ds0)(i => (i * 2654435761L % 41) - 20)
    val df = spark.range(200).select(col("id"),
      expr("transform(sequence(0, 15), i -> pmod(xxhash64(id, i), 41) - 20)")
        .as("v"))
    val viaKernel = df.select(col("id"),
        PqEncode(col("v"), typedlit(cbR), m, k).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    // relational argmin replay
    val sub = df.select(col("id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), mi -> struct(mi AS m, slice(v, mi * $ds0 + 1, $ds0) AS sv))"))
        .as("s"))
      .select(col("id"), col("s.m").as("m"), col("s.sv").as("sv"))
    val cbDf = (0 until m).flatMap(mi => (0 until k).map(j =>
        (mi, j, cbR.slice((mi * k + j) * ds0, (mi * k + j + 1) * ds0).toSeq)))
      .toDF("m", "j", "cw")
    val viaRel = sub.join(broadcast(cbDf), Seq("m"))
      .withColumn("dist", SqDistLong(col("sv"), col("cw")))
      .groupBy("id", "m")
      .agg(min_by(col("j"), struct(col("dist"), col("j"))).as("j"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("j")))),
        p => p.getField("j").cast("long")).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel === viaRel)
  }
}

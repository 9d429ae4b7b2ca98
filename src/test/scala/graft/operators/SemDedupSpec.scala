package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{ArgmaxCosine, CosineSim}

class SemDedupSpec extends SparkSpec {

  private val dim = 16

  private def randVecs(n: Int, salt: Int): DataFrame =
    spark.range(n.toLong).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), i -> " +
        s"cast(pmod(xxhash64(id, i, $salt), 1000) as double) / 250.0 - 2.0)")
        .as("vec"))

  private def bruteAssign(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("cl").asc)
    vecs.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cl"),
        CosineSim(col("vec"), col("centroid")).as("cos_sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "cl", "cos_sim")
  }

  test("ArgmaxCosine is bit-equal to crossJoin+window, pruned and unpruned") {
    val k = 37
    val vecs = randVecs(3000, salt = 7)
    val cent = randVecs(k, salt = 99)
      .select(col("vec_id").as("cl"), col("vec").as("centroid"))
    val idx = SemDedup.collectIndex(cent, "cl", "centroid")
    assert(idx.pairDist.isDefined)

    // warm starts: mostly plausible, some WRONG, some unknown (-1), some
    // out-of-range ids — the prune must survive adversarial priors
    val withPrev = vecs.withColumn("prev",
      when(col("vec_id") % 11 === 0, lit(-1L))
        .when(col("vec_id") % 7 === 0, lit(9999L)) // unknown id → full scan
        .otherwise(pmod(col("vec_id") * 31, lit(k.toLong))))
    val fast = SemDedup.assign(withPrev, col("vec"), col("prev"), idx)
      .select("vec_id", "cl", "cos_sim")
    val brute = bruteAssign(vecs, cent)
    // exact double equality on cos_sim and exact cl
    assert(fast.join(brute, Seq("vec_id"))
      .filter(fast("cl") =!= brute("cl") || fast("cos_sim") =!= brute("cos_sim"))
      .count() == 0)
    assert(fast.count() == 3000)
  }

  test("ArgmaxCosine tiebreak picks the smaller cl on an exact tie") {
    // two identical centroids under different ids; every vector ties
    val cent = Seq((5L, Array.fill(dim)(1.0)), (2L, Array.fill(dim)(1.0)))
    val idx = ArgmaxCosine.buildIndex(cent)
    val vecs = randVecs(50, salt = 3).withColumn("prev", lit(5L))
    val got = SemDedup.assign(vecs, col("vec"), col("prev"), idx)
      .select("cl").distinct().collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ArgmaxCosine above matrixMaxK falls back to unpruned, still exact") {
    // tiny dim keeps the big index cheap; k just over the matrix cap
    val k = ArgmaxCosine.matrixMaxK + 3
    val cents = (0 until k).map(j =>
      (j.toLong, Array.tabulate(dim)(i =>
        ((j * 31 + i * 17) % 1000) / 250.0 - 2.0)))
    val idx = ArgmaxCosine.buildIndex(cents)
    assert(idx.pairDist.isEmpty)
    val vecs = randVecs(200, salt = 5).withColumn("prev",
      pmod(col("vec_id"), lit(k.toLong)))
    val cent = spark.createDataFrame(cents.map { case (c, a) => (c, a.toSeq) })
      .toDF("cl", "centroid")
    val fast = SemDedup.assign(vecs, col("vec"), col("prev"), idx)
      .select("vec_id", "cl", "cos_sim")
    val brute = bruteAssign(vecs, cent)
    assert(fast.join(brute, Seq("vec_id"))
      .filter(fast("cl") =!= brute("cl") || fast("cos_sim") =!= brute("cos_sim"))
      .count() == 0)
  }

  private def plantedSet(vecs: DataFrame): DataFrame =
    vecs.unionByName(vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("vec"), x => x * lit(2.0)).as("vec")))

  test("dupsWithinClusters: guarded == all-pairs when no cluster exceeds the cap") {
    val base = plantedSet(randVecs(400, salt = 11))
      .withColumn("cl", pmod(col("vec_id"), lit(8L)))
    val guarded = SemDedup.dupsWithinClusters(base, "vec_id", "vec", "cl",
      threshold = 0.9, sizeCap = 10000)
    val brute = base.as("a").join(base.as("b"),
        col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id"))
      .filter(CosineSim(col("a.vec"), col("b.vec")) >= 0.9)
      .select(col("b.vec_id").as("dup_id")).distinct()
    assert(guarded.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(guarded).count() == 0)
  }

  test("dupsWithinClusters: banded path finds every exact ×2 copy; no false dups") {
    // one mega-cluster (cl 0 gets ~half the ids) plus small clusters
    val base = plantedSet(randVecs(600, salt = 13))
      .withColumn("cl",
        when(pmod(col("vec_id"), lit(10L)) < 5, lit(0L))
          .otherwise(pmod(col("vec_id"), lit(10L))))
    val cap = 80 // mega-cluster (~330 members) goes banded; others stay all-pairs
    val sizes = base.groupBy("cl").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(0L) > cap && sizes.values.exists(_ <= cap))

    val guarded = SemDedup.dupsWithinClusters(base, "vec_id", "vec", "cl",
      threshold = 0.9995, sizeCap = cap, bands = 4, bits = 8)
    val got = guarded.collect().map(_.getLong(0)).toSet
    // every planted copy shares its original's cluster (same id mod) and
    // its exact hyperplane signature (positive scaling preserves signs),
    // so the banded path must surface ALL of them
    val want = base.filter(col("vec_id") >= 100000L)
      .collect().map(_.getLong(0)).toSet
    assert(want.subsetOf(got), s"missed ${want -- got}")
    // anything else reported must genuinely clear the exact threshold
    val brute = base.as("a").join(base.as("b"),
        col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id"))
      .filter(CosineSim(col("a.vec"), col("b.vec")) >= 0.9995)
      .select(col("b.vec_id").as("dup_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(brute), s"false dups ${got -- brute}")
  }
}

package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** KCenter.runBatched must equal KCenter.run EXACTLY — same centers in
  * the same order, same per-point assignment — for any (k, m),
  * including adversarial clustered data where in-batch candidates
  * invalidate each other and the provable-acceptance rule has to stop
  * batches early (m=1 degenerates to the sequential loop itself).
  */
class KCenterBatchedSpec extends SparkSpec {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // two tight clusters + scattered noise: the clusters make top-m
  // candidates mutually-invalidating (accepting one collapses the
  // others' minds), noise gives occasional far singletons
  private def pts(n: Int) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("vq", ArrayType(LongType, containsNull = false))))
    val rows = (0 until n).map { i =>
      val base: Array[Long] =
        if (i % 3 == 0) Array(0L, 0L, 0L, 0L)
        else if (i % 3 == 1) Array(1000L, 1000L, 0L, 0L)
        else Array(mix(i) % 500L, mix(i + 7) % 500L,
          mix(i + 13) % 500L, mix(i + 19) % 500L)
      val jit = base.zipWithIndex.map { case (v, d) =>
        v + (mix(i * 31 + d) % 5L)
      }
      Row(i.toLong, jit.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batched == sequential across k and m (clustered fixture)") {
    val p = pts(60).cache()
    p.count()
    for (k <- Seq(1, 5, 12); m <- Seq(1, 3, 8, 64)) {
      val seqA = collectAssign(KCenter.run(p, k))
      val batA = collectAssign(KCenter.runBatched(p, k, m))
      assert(batA == seqA, s"divergence at k=$k m=$m: " +
        s"batched-only=${batA.diff(seqA).take(3)} " +
        s"sequential-only=${seqA.diff(batA).take(3)}")
    }
    p.unpersist()
  }

  test("k larger than the point count returns every point assigned") {
    val p = pts(5)
    val got = collectAssign(KCenter.runBatched(p, k = 9, m = 4))
    assert(got.size == 5)
    // every point that became a center has dist 0 to itself
    assert(got.count(_._3 == 0L) >= math.min(5, 9) - 1)
  }
}

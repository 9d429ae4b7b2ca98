package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters along different axes, 30 vectors each
  private def clustered = {
    val rnd = new scala.util.Random(99)
    (0 until 90).map { i =>
      val c = i % 3
      val base = Array.fill(12)(0.0f)
      base(c * 4) = 10.0f // cluster axis
      val noisy = base.map(v => v + rnd.nextFloat() * 0.5f)
      (i.toLong, c, noisy.toSeq)
    }.toDF("vec_id", "cluster", "vec")
  }

  test("centroids recover the cluster axes") {
    val cents = Similarity.centroids(clustered, "cluster", "vec")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents.size == 3)
    (0 until 3).foreach { c =>
      val cent = cents(c)
      assert(cent(c * 4) > 9.5 && cent(c * 4) < 10.6)
      assert(cent.zipWithIndex.filter(_._2 != c * 4).forall(_._1 < 1.0))
    }
  }

  test("ivfSearch with nprobe=1 matches brute force for an in-cluster query") {
    val query = Seq.tabulate(12)(i => if (i == 4) 10.0 else 0.1) // cluster 1 axis
    val ivf = Similarity.ivfSearch(clustered, "cluster", "vec", "vec_id",
      query, nprobe = 1, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteTopK(clustered, "vec", "vec_id", query, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
    assert(ivf.forall(_ % 3 == 1)) // all results from cluster 1
  }

  test("embeddingDedup drops planted cosine near-duplicates") {
    val rnd = new scala.util.Random(5)
    val base = Array.tabulate(12)(i => rnd.nextFloat() * 2 - 1)
    val docs = Seq(
      (1L, base.toSeq),
      (2L, base.map(_ * 1.01f).toSeq),        // same direction → cosine ≈ 1
      (3L, base.map(v => -v).toSeq),           // opposite → cosine -1, different bucket anyway
      (4L, Array.tabulate(12)(i => if (i == 3) 5.0f else 0.01f).toSeq))
      .toDF("vec_id", "vec")
    val kept = Similarity.embeddingDedup(docs, "vec_id", "vec", 0.95, bits = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // 2 dropped as near-dup of 1
  }

  test("ivfSearch with nprobe=all equals brute force everywhere") {
    val query = Seq.tabulate(12)(i => 1.0 + i * 0.1)
    val ivf = Similarity.ivfSearch(clustered, "cluster", "vec", "vec_id",
      query, nprobe = 3, k = 10)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    val brute = Similarity.bruteTopK(clustered, "vec", "vec_id", query, 10)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
    assert(ivf.map(_._1) == brute.map(_._1))
  }
}

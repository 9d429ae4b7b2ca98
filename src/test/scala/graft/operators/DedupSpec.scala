package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

  test("minhashDedup drops planted near-duplicates and keeps distinct docs") {
    val docs = Seq(
      (1L, base),
      (2L, base + " today"),                       // near-dup of 1
      (3L, base.replace("quick", "swift")),        // near-dup of 1
      (4L, "completely different text about spark catalyst optimizer rules and physical plans"),
      (5L, "yet another unrelated document mentioning minhash banding and jaccard similarity checks"))
      .toDF("doc_id", "text")
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(4L) && kept.contains(5L))
    assert(!kept.contains(2L) && !kept.contains(3L))
  }

  test("minhashCandidates reports exact jaccard for verified pairs") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Double]("jaccard") == 1.0)
  }

  test("simhash signatures are close for near-identical docs, far for unrelated") {
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "totally disjoint vocabulary discussing streaming watermarks state stores and checkpoints"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sigs(1L), sigs(2L)) < dist(sigs(1L), sigs(3L)))
    assert(dist(sigs(1L), sigs(2L)) <= 8)
    assert(dist(sigs(1L), sigs(3L)) > 8)
  }

  test("docs below shingle size are never near-dup candidates") {
    // < 3 tokens → zero 3-gram shingles → out of MinHash's scope: all
    // survive, even exact duplicates (exact dedup is q34's job)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val survivors = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L))
  }

  test("simhashCandidates finds hamming-close pairs via 16-bit banding") {
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // identical → dist 0
      (3L, "unrelated corpus of words about glaciers volcanoes and tectonic plates moving slowly"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashCandidates(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0)))
  }

  test("md5Hash64Local matches the Column md5Hash64 bit-for-bit") {
    val inputs = Seq("", "a", "hello world", "-123_0", "9223372036854775807_2",
      base, "unicode ééé 中文")
    val viaSpark = inputs.toDF("s")
      .select(col("s"), Dedup.md5Hash64(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    inputs.foreach { s =>
      assert(Dedup.md5Hash64Local(s) == viaSpark(s), s"mismatch for '$s'")
    }
  }
}

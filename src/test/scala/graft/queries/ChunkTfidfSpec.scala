package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary math for the chunking / TF-IDF / pair-count queries
  * (q131–q133) on documents sized exactly at the window and stride
  * edges (win=32, stride=24 → chunk starts 1, 25, 49, …).
  */
class ChunkTfidfSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-chunk").toFile
    d.deleteOnExit()
    Seq(
      (0L, "", "en", "web"),
      (1L, "solo", "en", "web"),
      (32L, doc(32), "en", "web"),
      (33L, doc(33), "en", "web"),
      (56L, doc(56), "en", "web"),
      (57L, doc(57), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, dir)

  test("q132 chunk counts and sizes at window/stride boundaries") {
    val rows = run("q132_chunk_overlap")
      .select("doc_id", "chunk_id", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    // n<=32 → one chunk of n tokens (empty doc included: one empty chunk)
    assert(rows(0L) == List(0L))
    assert(rows(1L) == List(1L))
    assert(rows(32L) == List(32L))
    // n=33 → [1..32], [25..33]
    assert(rows(33L) == List(32L, 9L))
    // n=56 → second chunk exactly fills the window
    assert(rows(56L) == List(32L, 32L))
    // n=57 → three chunks, last is the 9-token tail [49..57]
    assert(rows(57L) == List(32L, 32L, 9L))
  }

  test("q132 strided chunks cover every token with the expected overlap") {
    // total chunked tokens = n + 8 * (nChunks - 1) for stride 24 / win 32
    val rows = run("q132_chunk_overlap")
      .groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("tot"), count(lit(1)).as("k"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, n) <- Seq(33L -> 33, 56L -> 56, 57L -> 57)) {
      val (tot, k) = rows(id)
      assert(tot == n + 8 * (k - 1), s"doc $id: tot=$tot k=$k")
    }
  }

  test("q131 emits at most 3 ranked terms per doc, rank-ordered by score") {
    val rows = run("q131_tfidf")
      .select("doc_id", "score", "rnk")
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    for ((id, rs) <- rows) {
      assert(rs.length <= 3, s"doc $id has ${rs.length} terms")
      assert(rs.map(_._3).toList == (1L to rs.length).toList)
      assert(rs.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"doc $id scores not non-increasing")
    }
  }

  test("q133 pair counts: n-token doc contributes n-1 pairs, short docs none") {
    // the fixture's "t<i> t<i+1>" pairs are unique per position except the
    // shared prefixes across docs; just pin the global invariant on totals
    val total = run("q133_bpe_pairs")
      .agg(sum("cnt")).as[Long].collect().head
    // top-20 can't exceed the corpus pair count: 0+0+31+32+55+56 = 174
    assert(total <= 174L && total > 0L)
    // and the full pair relation (pre-limit) has exactly 174 rows: recompute
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val allPairs = spark.read.parquet(s"$dir/documents.parquet")
      .select(toks.as("tk"))
      .select((greatest(size(col("tk")) - 1, lit(0))).as("np"))
      .agg(sum("np")).as[Long].collect().head
    assert(allPairs == 174L)
  }
}

package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Goldens + totality for the corpus-statistics batch (q184–q189). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String =
    writeDocsSrc(rows.map { case (id, tx) => (id, tx, "web") })

  private def writeDocsSrc(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("graft-corpusstats").toFile
    d.deleteOnExit()
    rows.map { case (id, tx, src) => (id, tx, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def q(name: String) = Registry.all.find(_.name == name).get

  test("new corpus-stats queries are total on 0-2 token documents") {
    val dir = writeDocs(Seq(
      (0L, ""), (1L, "one"), (2L, "two tokens"),
      (3L, "a longer document with plenty of tokens to form grams and windows")))
    for (n <- Seq("q184_gopher_ngrams", "q185_pmi_collocations",
      "q186_hll_distinct", "q187_ngram_novelty", "q188_kcore",
      "q189_cm_sketch", "q190_dsir_weights", "q191_source_containment",
      "q192_gini_diversity", "q194_curation_policy"))
      q(n).run(spark, dir).collect() // must not throw
  }

  test("q190: docs matching the target domain's grams score highest") {
    val dir = writeDocsSrc(Seq(
      (1L, "alpha beta gamma delta", "src0"),
      (2L, "alpha beta gamma delta", "web"),   // same grams as target
      (3L, "zz yy xx ww vv uu", "web")))       // no target overlap
    val rows = q("q190_dsir_weights").run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == rows(2L)) // identical gram sets, identical score
    assert(rows(2L) > rows(3L))
    assert(rows(3L) == 0L)       // zero target mass in its buckets
  }

  test("q191: hand-computed containment between two sources") {
    val dir = writeDocsSrc(Seq(
      (1L, "a b c d e", "s1"),   // shingles: abc bcd cde
      (2L, "a b c x y", "s2")))  // shingles: abc bcx cxy
    val rows = q("q191_source_containment").run(spark, dir).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getAs[Long]("inter") == 1L)   // only "a b c" shared
      assert(r.getAs[Long]("size1") == 3L)
      assert(r.getAs[Double]("containment") == 1.0 / 3.0)
    }
  }

  test("q192: hand-computed Gini diversity") {
    val dir = writeDocs(Seq((1L, "a a b")))
    val r = q("q192_gini_diversity").run(spark, dir).collect().head
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("gini_num") == 4L) // 9 - (4 + 1)
    assert(r.getAs[Double]("gini") == 4.0 / 9.0)
  }

  test("q184: hand-computed top/dup n-gram char coverage") {
    // tokens: a b a b a b c  (7 tokens, 7 chars)
    // top 2-gram "a b" occurs at i=1,3,5 -> covers positions 1..6 -> 6 chars
    // top 3-gram "a b a" at i=1,3 -> positions 1..5 -> 5 chars
    // top 4-gram "a b a b" at i=1,3 -> positions 1..6 -> 6 chars
    // 5-grams all unique -> dup5 = 0
    val dir = writeDocs(Seq((7L, "a b a b a b c")))
    val r = q("q184_gopher_ngrams").run(spark, dir).collect().head
    assert(r.getAs[Long]("total_chars") == 7L)
    assert(r.getAs[Long]("top2_chars") == 6L)
    assert(r.getAs[Long]("top3_chars") == 5L)
    assert(r.getAs[Long]("top4_chars") == 6L)
    assert(r.getAs[Long]("dup5_chars") == 0L)
    assert(r.getAs[Long]("dup8_chars") == 0L)
  }

  test("q184: duplicated 5-grams cover their positions") {
    // "x y z w v x y z w v x" : duplicated 5-grams "x y z w v" (i=1,6)
    // and "y z w v x" (i=2,7) -> union covers all 11 positions
    val dir = writeDocs(Seq((1L, "x y z w v x y z w v x")))
    val r = q("q184_gopher_ngrams").run(spark, dir).collect().head
    assert(r.getAs[Long]("total_chars") == 11L)
    assert(r.getAs[Long]("dup5_chars") == 11L)
  }

  test("q185: rational PMI ranks the dominant pair first") {
    val dir = writeDocs(Seq((1L, "p q p q p q p q p q p q")))
    // bigrams: (p,q) x6, (q,p) x5; N=11; cp=cq=6
    val rows = q("q185_pmi_collocations").run(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("w1") == "p" &&
      rows(0).getAs[String]("w2") == "q")
    assert(rows(0).getAs[Long]("cxy") == 6L)
    assert(math.abs(rows(0).getAs[Double]("pmi_ratio") - 66.0 / 36.0) == 0.0)
    assert(rows(1).getAs[Double]("pmi_ratio") == 55.0 / 36.0)
  }

  test("q186: registers reconstruct the harmonic sum; exact count matches") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma theta iota kappa")))
    val rows = q("q186_hll_distinct").run(spark, dir).collect()
    assert(rows.length == 64)
    val s = rows.head.getAs[Long]("s_scaled")
    val fromRegs = rows.map(r => 1L << (56 - r.getAs[Long]("reg").toInt)).sum
    assert(s == fromRegs)
    // distinct 3-shingles: doc1 has 4, doc2 has 4, "alpha beta gamma" shared
    assert(rows.head.getAs[Long]("exact_distinct") == 7L)
    assert(rows.head.getAs[Double]("est") > 0.0)
  }

  test("q187: an exact duplicate doc has zero novelty") {
    val text = "one two three four five six seven eight nine ten"
    val dir = writeDocs(Seq((1L, text), (2L, text),
      (3L, "totally different words making their own novel eight gram run")))
    val rows = q("q187_ngram_novelty").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == (3L, 3L)) // 10 tokens -> 3 distinct 8-shingles, all first
    assert(rows(2L) == (3L, 0L)) // duplicate: nothing novel
    assert(rows(3L)._1 == rows(3L)._2) // unique text: all novel
  }

  test("q188: matches an independent in-memory bounded peel") {
    val dir = writeDocs((0L until 60L).map(i =>
      (i, ("w " * (i % 13 + 1).toInt).trim)))
    val got = q("q188_kcore").run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force the same constants on the driver
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    var edges = docs.flatMap { case (id, nc) =>
      Seq((id, id + 1 + nc % 7), (id, id + 2 + id % 5),
        (id, id + 3 + (nc * 3) % 11))
    }.distinct.toSeq
    for (_ <- 1 to 4) {
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val alive = deg.filter(_._2 >= 4).keySet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
    }
    val want = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }

  test("q193: streaming HLL registers equal the batch register math") {
    import graft.operators.Dedup
    val d = Files.createTempDirectory("graft-streamhll").toFile
    d.deleteOnExit()
    val base = 1700000000L * 1000000000L // INT64 nanos, driver physical type
    (0 until 40).map(i =>
      (i.toLong, (i % 13).toLong, "view", base + i * 60L * 1000000000L))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/events.parquet")
    val got = q("q193_stream_hll").run(spark, d.getAbsolutePath).collect()
    assert(got.length == 64)
    val exp = new Array[Long](64)
    for (u <- 0 until 13) {
      val h = Dedup.md5Hash64Local(u.toString)
      val b = (h % 64).toInt
      val w = h >>> 6
      val rho =
        if (w == 0L) 55L
        else 55L - (64L - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > exp(b)) exp(b) = rho
    }
    val gotRegs = got
      .map(r => r.getAs[Long]("bucket").toInt -> r.getAs[Long]("reg")).toMap
    for (b <- 0 until 64) assert(gotRegs(b) == exp(b))
    assert(got.head.getAs[Long]("exact_distinct") == 13L)
  }

  test("q194: repetition filter, per-source cap, and deterministic split") {
    import graft.operators.Dedup
    // doc 1 is pure 2-gram repetition -> dropped by the top2 threshold;
    // docs 2..13 are all-distinct-token docs with strictly decreasing
    // length -> the per-source cap keeps the 10 longest (ids 2..11)
    val rows = (1L, "x y x y x y x y x y", "s1") +:
      (2L to 13L).map { i =>
        val n = (30 - i).toInt
        (i, (1 to n).map(j => f"d$i%02dt$j%02d").mkString(" "), "s1")
      }
    val dir = writeDocsSrc(rows)
    val got = q("q194_curation_policy").run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(got.keySet == (2L to 11L).toSet)
    for ((id, split) <- got) {
      val want =
        if (Dedup.md5Hash64Local(id.toString) % 10 < 8) "train" else "val"
      assert(split == want, s"doc $id")
    }
  }

  test("q189: the sketch never undercounts and probes match exact counts") {
    val dir = writeDocs(Seq(
      (1L, "a b c a b c a b c d e f"),
      (2L, "a b c d e f g h i j k l")))
    val rows = q("q189_cm_sketch").run(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getAs[Boolean]("no_undercount")))
    assert(rows.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("exact_c")))
    val top = rows.map(r => (r.getAs[String]("gram"), r.getAs[Long]("exact_c")))
    assert(top.contains(("a b c", 4L))) // 3 in doc1 + 1 in doc2
  }
}

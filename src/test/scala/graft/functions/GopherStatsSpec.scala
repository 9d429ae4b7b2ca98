package graft.functions

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The fused Gopher kernel vs an INDEPENDENT Scala reference
  * implementation (plain collections + java Strings — none of the
  * kernel's code paths): top-gram tie-breaks must follow binary UTF-8
  * byte order (Spark's string sort order and DuckDB's default
  * collation), coverage must count each token position once, and
  * token-less docs yield all-zero structs (the caller filters them).
  */
class GopherStatsSpec extends SparkSpec {

  // ---- independent reference ------------------------------------------

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def ref(toks: Seq[String]): Seq[Long] = {
    val lw = toks.map(t => t.codePointCount(0, t.length).toLong)
    val total = lw.sum
    def coverage(n: Int, top: Boolean): Long = {
      if (toks.length < n) return 0L
      val occ = (0 to toks.length - n)
        .map(i => (toks.slice(i, i + n).mkString(" "), i))
        .groupBy(_._1).map { case (g, ps) => (g, ps.map(_._2)) }
      val qual: Iterable[Seq[Int]] =
        if (top) {
          val best = occ.toSeq.sortWith { case ((g1, p1), (g2, p2)) =>
            if (p1.length != p2.length) p1.length > p2.length
            else utf8Lt(g1, g2)
          }.head
          Seq(best._2.toSeq)
        } else occ.collect { case (_, ps) if ps.length >= 2 => ps.toSeq }
      val covered = qual.flatten.flatMap(p => p until p + n).toSet
      covered.toSeq.map(lw).sum
    }
    Seq(total, coverage(2, top = true), coverage(3, top = true),
      coverage(4, top = true), coverage(5, top = false),
      coverage(8, top = false))
  }

  private def kernel(docs: Seq[Seq[String]]): Seq[Seq[Long]] = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("tk", ArrayType(StringType))))
    val rows = docs.zipWithIndex.map { case (d, i) => Row(i, d) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    df.select(col("id"), GopherStats(col("tk")).as("g"))
      .orderBy("id")
      .collect()
      .map { r =>
        val g = r.getStruct(1)
        (0 until 6).map(g.getLong)
      }.toSeq
  }

  test("crafted docs: repeats, ties, boundary widths, unicode") {
    val docs: Seq[Seq[String]] = Seq(
      Seq("a"),                                  // no grams at all
      Seq("aa", "bb"),                           // exactly one 2-gram
      Seq("x", "y", "x", "y", "x", "y", "x", "y"), // heavy repetition
      // 2-gram tie between ("ab","c") and ("a","bc") joined forms:
      // "ab c" vs "a bc" — binary order must pick "a bc"
      Seq("ab", "c", "a", "bc", "ab", "c", "a", "bc"),
      // 8 identical tokens → the single duplicated 5-gram family and
      // one 8-gram (count 1 → dup8 = 0)
      Seq.fill(8)("tok"),
      Seq.fill(16)("tok"),                       // duplicated 8-grams too
      Seq("é", "→", "é", "→", "é"),              // multi-byte tokens
      // token containing  (below space): joined-string order vs
      // token-wise order diverge — kernel must match the joined form
      Seq("ab", "z", "a", "bz", "ab", "z", "a", "bz"),
      Seq.empty[String]                          // zero tokens → zeros
    )
    val got = kernel(docs)
    docs.zip(got).foreach { case (d, g) =>
      assert(g == ref(d), s"doc=$d got=$g want=${ref(d)}")
    }
  }

  test("randomized against the independent reference") {
    val rnd = new Random(1405)
    val vocab = Vector("a", "b", "ab", "ba", "the", "of", "é", "xx",
      "a", "longertoken")
    val docs = (0 until 200).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
    }
    val got = kernel(docs)
    docs.zip(got).foreach { case (d, g) =>
      assert(g == ref(d), s"doc=$d got=$g want=${ref(d)}")
    }
  }

  test("q184 plan is scan-bound: zero exchanges, kernel inside codegen") {
    val p = graft.queries.CorpusStats
      .gopherNgrams(graft.core.Tables.load(spark, "/root/testdata/sf0.001",
        "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("*("), p) // whole-stage codegen span
  }
}

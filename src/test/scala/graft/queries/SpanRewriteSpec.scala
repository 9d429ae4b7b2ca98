package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** q202 rewrite semantics on planted copies: the global first
  * occurrence of a duplicated span keeps its text, every later
  * occurrence is excised, unique content survives untouched.
  */
class SpanRewriteSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      schema)
  }

  private val span16 =
    (1 to 16).map(i => s"tok$i").mkString(" ")

  test("copied span is cut from the later doc, kept in the first") {
    val d = docs(
      1L -> s"alpha beta $span16 gamma delta",
      2L -> s"unrelated prefix words here $span16 and a different tail")
    val got = TextOps.spanRewrite(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // doc 1 owns every duplicated window → nothing cut
    assert(got(1L) == ((20, 0L)), got)
    // doc 2: the 16 copied positions are cut (its unique prefix/tail stay)
    assert(got(2L)._2 == 16L, got)
  }

  test("within-doc repeat counts as an occurrence and is cut once") {
    val d = docs(3L -> s"$span16 bridge word $span16")
    val got = TextOps.spanRewrite(d).collect()(0)
    // 34 tokens; the SECOND occurrence (positions 19..34) is cut
    assert(got.getInt(1) == 34 && got.getLong(2) == 16L, got)
  }

  test("rewritten digest equals md5 of the expected surviving tokens") {
    val d = docs(
      1L -> s"alpha beta $span16 gamma delta",
      2L -> s"unrelated prefix words here $span16 and a different tail")
    val got = TextOps.spanRewrite(d).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(1L) == md5hex(s"alpha beta $span16 gamma delta"))
    assert(got(2L) ==
      md5hex("unrelated prefix words here and a different tail"))
  }

  test("no duplicated spans -> every doc intact") {
    val d = docs(
      1L -> "one two three four five",
      2L -> "six seven eight nine ten")
    val got = TextOps.spanRewrite(d).collect()
    assert(got.forall(_.getLong(2) == 0L), got.mkString(","))
  }
}

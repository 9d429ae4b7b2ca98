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

  // Two DISTINCT 16-token windows engineered (offline birthday search
  // over md5-derived token hashes) to collide under the ORIGINAL 31-bit
  // Karp-Rabin fold (both fold to 1263589055 mod 2147483647). Under the
  // old scheme the rewrite excised doc 2's window as a "duplicate" of
  // doc 1's — silent corpus corruption the round-14 verdict flagged.
  private val collideBase = (0 to 13).map(i => s"base$i").mkString(" ")
  private val windowA = s"$collideBase x36560 y36560"
  private val windowB = s"$collideBase x62909 y62909"

  test("engineered 31-bit fold collision pair: old fold collides, new fold separates") {
    def tokHash(t: String): Long =
      graft.operators.Dedup.md5Hash64Local(t) % 1000000007L
    def fold(win: String, mod: Long): Long =
      win.split(" ").map(tokHash)
        .foldLeft(0L)((acc, h) => (acc * 1000003L + h) % mod)
    assert(fold(windowA, 2147483647L) == fold(windowB, 2147483647L),
      "fixture stale: the engineered pair no longer collides mod 2^31-1")
    assert(fold(windowA, graft.functions.WindowFingerprints.DefaultMod) !=
      fold(windowB, graft.functions.WindowFingerprints.DefaultMod))
  }

  test("engineered colliding windows are NOT cut (43-bit fold + exact verify)") {
    val d = docs(
      1L -> s"left pad $windowA right pad",
      2L -> s"other text $windowB different end")
    val got = TextOps.spanRewrite(d).collect()
    assert(got.forall(_.getLong(2) == 0L),
      "distinct-content windows were cut: " + got.mkString(","))
  }

  test("prefilter collisions under a tiny fold modulus never cut distinct content") {
    // mod 97 forces massive prefilter collisions across these windows;
    // only the exact content verify stands between them and a cut
    val d = docs(
      1L -> (1 to 24).map(i => s"aw$i").mkString(" "),
      2L -> (1 to 24).map(i => s"bw$i").mkString(" "),
      3L -> (1 to 24).map(i => s"cw$i").mkString(" "))
    val got = TextOps.spanRewrite(d, 16, 97L).collect()
    assert(got.forall(_.getLong(2) == 0L), got.mkString(","))
  }

  test("true duplicates still cut under a tiny fold modulus") {
    val d = docs(
      1L -> s"alpha beta $span16 gamma",
      2L -> s"prefix tokens here $span16 tail")
    val got = TextOps.spanRewrite(d, 16, 97L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L && got(2L) == 16L, got)
  }

  test("doc with >= 2^20 tokens fails loudly (ownership-key guard)") {
    // all-distinct tokens: no duplicate windows, so the candidate path
    // is empty and the guard (in the ledger stage) is the only cost
    val big = new StringBuilder
    var i = 0
    while (i < 1048576) { big.append("t").append(i).append(' '); i += 1 }
    val d = docs(1L -> big.toString)
    val e = intercept[Exception] {
      TextOps.spanRewrite(d).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ownership key would collide")), e)
  }
}

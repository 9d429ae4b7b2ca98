package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NfcNormalize: JDK Normalizer semantics through the codegen path,
  * the composition cases the tokenizer seam documents, and the
  * fixed-point fast path.
  */
class NfcNormalizeSpec extends SparkSpec {

  // decomposed -> composed pairs (escaped: source must never carry
  // raw combining sequences an editor could silently recompose)
  private val cases = Seq(
    "\u304b\u3099" -> "\u304c",           // ka + voicing -> ga
    "\u30ab\u3099" -> "\u30ac",           // KA + voicing -> GA
    "e\u0301" -> "\u00e9",
    "A\u030a" -> "\u00c5",
    "\u03b1\u0301" -> "\u03ac",
    "\u1100\u1161\u11a8" -> "\uac01",    // jamo -> syllable
    // composition EXCLUSION: stays decomposed under NFC
    "\u0915\u093c" -> "\u0915\u093c",
    // already composed: fixed point
    "\u00e9\u304c" -> "\u00e9\u304c",
    "plain ascii" -> "plain ascii",
    "" -> "")

  test("local computes UAX #15 NFC including exclusions") {
    cases.foreach { case (in, want) =>
      assert(NfcNormalize.local(in) == want,
        s"NFC(${in.map(c => f"\\u$c%04x").mkString}) wrong")
    }
  }

  test("codegen column path equals local; tokenization composes") {
    import spark.implicits._
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "t")
    val got = df.select(col("id"), NfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) == want, s"kernel mismatch on case $i")
    }
    // the seam posture: decomposed kana is TWO tokens raw, ONE
    // singleton composed — NFC before tokenize fixes it
    val raw = Seq(Tuple1("が")).toDF("t")
    val nRaw = raw.select(size(UnicodeTokens(col("t")))).collect()(0).getInt(0)
    val nNfc = raw.select(size(UnicodeTokens(NfcNormalize(col("t")))))
      .collect()(0).getInt(0)
    assert(nRaw == 2 && nNfc == 1, s"raw=$nRaw nfc=$nNfc")
  }
}

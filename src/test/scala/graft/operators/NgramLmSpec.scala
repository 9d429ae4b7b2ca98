package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.NgramLmScore

/** The trained n-gram LM artifact (r19 verdict top item — KenLM/CCNet
  * posture): training determinism, artifact round-trip, the smoothed
  * backoff arithmetic against a naive local replay, magnitude bounds,
  * fixed-threshold bucketing non-degeneracy over the fluency classes
  * the gated queries mix, and the kernel path over a DataFrame.
  */
class NgramLmSpec extends SparkSpec {

  private def naiveScore(m: NgramLmModel, joined: String): (Long, Long) = {
    // independent replay: codepoint vector + per-window map lookups
    val cps = joined.codePoints().toArray
    var total = 0L
    var n = 0L
    var i = 0
    while (i + 2 < cps.length) {
      val g = new String(cps, i, 3)
      val c = new String(cps, i, 2)
      val q =
        if (m.g3.containsKey(g)) m.g3.get(g).longValue()
        else if (m.g2.containsKey(c)) m.g2.get(c).longValue()
        else m.q0
      total += q
      n += 1
      i += 1
    }
    (total, n)
  }

  test("training is deterministic and the artifact round-trips exactly") {
    val m1 = NgramLm.train(NgramLm.referenceCorpus)
    val m2 = NgramLm.train(NgramLm.referenceCorpus)
    assert(m1.scale == m2.scale && m1.vocab == m2.vocab && m1.q0 == m2.q0)
    assert(m1.g3 == m2.g3 && m1.g2 == m2.g2)
    val p = java.io.File.createTempFile("gnlm", ".bin").getAbsolutePath
    m1.save(p)
    val r = NgramLmModel.load(p)
    assert(r.scale == m1.scale && r.vocab == m1.vocab && r.q0 == m1.q0)
    assert(r.g3 == m1.g3 && r.g2 == m1.g2)
    new java.io.File(p).delete()
  }

  test("every qlp is negative-or-zero, bounded, and ordered sanely") {
    val m = NgramLm.fixture
    import scala.jdk.CollectionConverters._
    val all = m.g3.values().asScala.map(_.longValue()) ++
      m.g2.values().asScala.map(_.longValue()) ++ Seq(m.q0)
    assert(all.forall(q => q <= 0 && q > -(1L << 15)))
    // a seen trigram beats its own context's unseen-char mass:
    // (count3+1)/(count2+V) > 1/(count2+V)
    m.g3.entrySet().asScala.foreach { e =>
      val ctx = e.getKey.substring(0,
        e.getKey.offsetByCodePoints(0, 2))
      assert(e.getValue.longValue() >= m.g2.get(ctx).longValue(),
        s"gram ${e.getKey} scores below its context default")
    }
  }

  test("scoreJoined ≡ the naive replay on all three lookup tiers") {
    val m = NgramLm.fixture
    val samples = Seq(
      "", "a", "ab", // sub-window inputs → (0, 0) paths
      "the weather is nice today", // trained text: trigram hits
      "the wzather is nice", // unseen trigram, seen contexts
      "zzqq zzqq zzqq", // unseen contexts → q0
      "学生们在毕业之前就学会了写代码", // fully OOV script
      "mixed 学生 text with 0x1f3a noise",
      new String(Character.toChars(0x1F600)) + "ab" +
        new String(Character.toChars(0x1F601))) // supplementary plane
    samples.foreach { raw =>
      val j = LangIdModel.joinedLocal(raw)
      assert(m.scoreJoined(j) == naiveScore(m, j), s"mismatch on: $raw")
    }
    assert(m.scoreJoined("") == (0L, 0L))
  }

  test("fixture thresholds separate the fluency classes the queries mix") {
    val m = NgramLm.fixture
    val (tLo, tHi) = NgramLm.thresholds(m)
    assert(tLo <= tHi && tLo < 0)
    def ppl(text: String): Long = {
      val (q, n) = m.scoreJoined(LangIdModel.joinedLocal(text))
      if (n == 0) 0L else -((-q) * m.scale / n)
    }
    def bucket(p: Long): String =
      if (p < tLo) "tail" else if (p < tHi) "middle" else "head"
    // the reference sentences themselves all bucket head (t_hi = the
    // worst reference score by construction)
    NgramLm.referenceCorpus.foreach(s =>
      assert(bucket(ppl(s)) == "head", s"ref not head: $s (${ppl(s)})"))
    // held-out fluent English never lands in tail, and at least one
    // held-out sentence reaches head (fluency generalizes)
    val fluent = LangId.evalExamples.collect { case ("en", s) => s }
    fluent.foreach(s =>
      assert(bucket(ppl(s)) != "tail", s"fluent in tail: $s (${ppl(s)})"))
    assert(fluent.exists(s => bucket(ppl(s)) == "head"))
    // OOV-script and noise docs always land in tail (q0-dominated)
    val noisyDocs = LangId.evalExamples.collect {
      case (l, s) if Seq("zh", "ja", "th", "und").contains(l) => s
    }
    noisyDocs.foreach(s =>
      assert(bucket(ppl(s)) == "tail", s"noise not in tail: $s (${ppl(s)})"))
    // other Latin languages sit in the middle band (within 1 bit/gram
    // of the reference floor but outside the reference distribution)
    val romance = LangId.evalExamples.collect {
      case (l, s) if Seq("es", "de", "fr").contains(l) => s
    }
    romance.foreach(s =>
      assert(bucket(ppl(s)) == "middle", s"$s (${ppl(s)})"))
  }

  test("kernel path over a DataFrame ≡ local scoring") {
    val m = NgramLm.fixture
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox", "zzqq unknown", "学生们在毕业之前",
      "", "data pipelines move large tables")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val r = NgramLmScore(
      concat_ws(" ", graft.core.Tok.words(col("text"))), m)
    val got = df.select(col("doc_id"), r.getField("lm_q").as("q"),
        r.getField("n_grams").as("n"))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = m.scoreJoined(LangIdModel.joinedLocal(t))
      assert(got(i.toLong) == want, s"kernel mismatch on: $t")
    }
  }
}

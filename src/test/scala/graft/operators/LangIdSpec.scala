package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.LangIdScores

/** The trained language-ID artifact (r18 verdict top item): perceptron
  * convergence, held-out accuracy, artifact round-trip determinism,
  * kernel ≡ local-forward equality, the low60 hash twin, and the
  * production preprocessing path over a DataFrame.
  */
class LangIdSpec extends SparkSpec {

  test("training converges and the held-out set classifies 100%") {
    val m = LangId.fixture
    assert(m.langs.toSeq == LangId.Langs)
    val misses = LangId.evalExamples.filter { case (gold, s) =>
      m.forwardLocal(s)._2 != gold
    }
    assert(misses.isEmpty,
      s"held-out misses: ${misses.map { case (g, s) =>
        s"$g->${m.forwardLocal(s)._2}: $s" }.mkString("; ")}")
    // training set itself is at zero errors by the convergence require
    val trainMisses = LangId.trainExamples.filter { case (gold, s) =>
      m.forwardLocal(s)._2 != gold
    }
    assert(trainMisses.isEmpty)
  }

  test("fixture-corpus English word-soup classifies en; CJK snippets zh/ja/th") {
    val m = LangId.fixture
    val doc = "group row vector table data value key hash spark join the " +
      "order filter vector query key filter small merge join agg key big " +
      "fast sort line scan part batch agg merge hash query"
    assert(m.forwardLocal(doc)._2 == "en")
    assert(m.forwardLocal("数据管道在大规模集群上运行　测试")._2 == "zh")
    assert(m.forwardLocal("ひらがなとカタカナの混在テキスト")._2 == "ja")
    assert(m.forwardLocal("ข้อมูลภาษาไทยสำหรับทดสอบ")._2 == "th")
  }

  test("artifact round-trip is byte-deterministic and value-identical") {
    val m1 = LangId.train(LangId.trainExamples)
    val m2 = LangId.train(LangId.trainExamples)
    val d = new java.io.File(System.getProperty("java.io.tmpdir"))
    val p1 = new java.io.File(d, "graft_langid_t1.bin").getAbsolutePath
    val p2 = new java.io.File(d, "graft_langid_t2.bin").getAbsolutePath
    m1.save(p1); m2.save(p2)
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    assert(b1.toSeq == b2.toSeq, "training is not deterministic")
    val r = LangIdModel.load(p1)
    assert(r.langs.toSeq == m1.langs.toSeq && r.d == m1.d)
    assert(r.bias.toSeq == m1.bias.toSeq)
    assert(r.w.map(_.toSeq).toSeq == m1.w.map(_.toSeq).toSeq)
  }

  test("low60 equals Dedup.md5Hash64Local") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("", "a", "th", "字字", " の", "0x", "ab", "ثث")) {
      assert(LangIdModel.low60(md,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) ==
        Dedup.md5Hash64Local(s), s"mismatch for '$s'")
    }
  }

  test("kernel over a DataFrame equals forwardLocal (codegen path)") {
    val m = LangId.fixture
    import spark.implicits._
    val rows = (LangId.evalExamples ++ Seq(
      ("und", ""), ("und", "x"),
      ("ja", "データ😀パイプ"))) // supplementary-plane char mid-text
      .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
    val df = rows.toDF("id", "gold", "text")
    val joined = concat_ws(" ", graft.core.Tok.words(col("text")))
    val lid = LangIdScores(joined, m)
    val got = df.select(col("id"), lid.getField("pred").as("pred"),
        lid.getField("scores").as("scores"))
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getSeq[Long](2).toArray))).toMap
    rows.foreach { case (id, _, text) =>
      val (sc, p) = m.forwardLocal(text)
      val (gp, gsc) = got(id)
      assert(gp == p, s"pred mismatch id=$id: kernel=$gp local=$p")
      assert(gsc.toSeq == sc.toSeq, s"scores mismatch id=$id")
    }
    // empty text scores are exactly the biases
    val (esc, _) = m.forwardLocal("")
    assert(esc.toSeq == m.bias.toSeq)
  }

  test("weight-magnitude guard rejects an out-of-bound model") {
    val width = 3 * 2 + 7
    val bad = Array.fill(width)(0L); bad(0) = 1L << 28
    val e = intercept[IllegalArgumentException] {
      LangIdModel(Array("a", "b"), 2,
        Array(0L, 0L), Array(bad, Array.fill(width)(0L)))
    }
    assert(e.getMessage.contains("magnitude"))
  }
}

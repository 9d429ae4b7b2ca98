package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Smoothed character n-gram language model through the TRAINED-
  * ARTIFACT seam (the r19 verdict's top item — the KenLM/CCNet
  * posture): every production corpus pipeline (CCNet, Gopher, FineWeb)
  * scores documents by reference-LM perplexity and buckets them
  * head/middle/tail for mixture weighting; this repo had a linear
  * quality classifier (q163) and Gopher stats (q184) but no LM-based
  * fluency score.
  *
  * Model: character TRIGRAM LM with add-one (Laplace) smoothing over
  * the code-point vocabulary of the training corpus,
  *
  *   p(c | ab) = (count(abc) + 1) / (count(ab) + V)
  *
  * trained on an embedded reference corpus of fluent English (the
  * LangId.trainExamples `en` sentences — deterministic, same artifact
  * on every JVM). Probabilities ship as QUANTIZED INTEGER log-probs
  * (the q166 power-of-2 recipe):
  *
  *   qlp = floor(1024 · log2(num / den))   (StrictMath — reproducible)
  *
  * so a document's total score is an EXACT Long sum both engines
  * replay bit-for-bit: the DuckDB oracle never computes a log — it
  * reads the (gram, qlp) table GENERATED from the same trained model
  * object (the never-hand-copy rule, LangId.scala:590) and verifies
  * the sum relationally (unnest trigram windows → two hash joins →
  * group-by sum — the r19 relational-oracle cost lesson).
  *
  * Scoring contract (mirrored by [[graft.functions.NgramLmScore]] and
  * [[NgramLm.scoredSql]]):
  *  - input = the space-joined script-aware token stream of
  *    lower(text) (the LangId preprocessing seam — whitespace
  *    normalized, so irregular separators never move a score);
  *  - one trigram window per code-point position i in [0, len-2):
  *    gram = s[i..i+3), context = its first two code points;
  *  - per-window qlp = g3(gram)                 if the trigram was seen
  *                   | g2(context)              else if the context was
  *                                              seen (the smoothed
  *                                              unseen-char mass
  *                                              1/(count2+V))
  *                   | q0 = floor(1024·log2(1/V)) else (unseen context:
  *                                              count2=0 ⇒ 1/V);
  *  - lm_q = Σ window qlp (≤ 0 always — every p ≤ 1), n_grams = the
  *    window count;
  *  - the per-gram average rides as ppl_q = -((-lm_q)·1024 div n_grams)
  *    — numerator and divisor non-negative, so Spark's truncating `div`
  *    ≡ DuckDB `//` (the r12 sign-decomposition rule) — LOWER
  *    perplexity (more fluent) = ppl_q closer to 0.
  *
  * Magnitude bound: |qlp| ≤ 1024·log2(count2max + V) < 2^15; a 2^40-
  * char document still sums within Long — no overflow path.
  *
  * 100 TB shape: inference is a pure per-row map (one codegen kernel,
  * model as a reference object, no shuffle, no driver data); bucketing
  * is one exact-rank pass (single sort) — both embarrassingly
  * parallel.
  */
final case class NgramLmModel(scale: Int, vocab: Int,
    g3: java.util.HashMap[String, java.lang.Long],
    g2: java.util.HashMap[String, java.lang.Long],
    q0: Long) {
  require(scale > 0 && vocab > 0, "implausible model dims")

  /** Exact-integer (total qlp, window count) of a PRE-JOINED token
    * stream — what the codegen kernel evaluates per row.
    */
  def scoreJoined(s: String): (Long, Long) = {
    var total = 0L
    var n = 0L
    // three-code-point sliding window over char offsets a < b < c < d
    var a = 0
    var b = if (a < s.length) s.offsetByCodePoints(a, 1) else s.length
    var c = if (b < s.length) s.offsetByCodePoints(b, 1) else s.length
    while (c < s.length) {
      val d = s.offsetByCodePoints(c, 1)
      val got3 = g3.get(s.substring(a, d))
      val q =
        if (got3 != null) got3.longValue()
        else {
          val got2 = g2.get(s.substring(a, c))
          if (got2 != null) got2.longValue() else q0
        }
      total += q
      n += 1
      a = b; b = c; c = d
    }
    (total, n)
  }

  /** Binary artifact (magic GNLM, LE): scale, vocab, q0, n3,
    * (len-prefixed UTF-8 gram, qlp)*, n2, (len-prefixed context, qlp)*.
    */
  def save(path: String): Unit = {
    def entries(m: java.util.HashMap[String, java.lang.Long]): Seq[(Array[Byte], Long)] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
        (k.getBytes(java.nio.charset.StandardCharsets.UTF_8), v.longValue())
      }
    }
    val e3 = entries(g3)
    val e2 = entries(g2)
    val n = 4 + 4 + 4 + 8 + 4 + e3.map(12 + _._1.length).sum +
      4 + e2.map(12 + _._1.length).sum
    val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GNLM".getBytes("US-ASCII"))
    bb.putInt(scale); bb.putInt(vocab); bb.putLong(q0)
    bb.putInt(e3.size)
    e3.foreach { case (k, v) => bb.putInt(k.length); bb.put(k); bb.putLong(v) }
    bb.putInt(e2.size)
    e2.foreach { case (k, v) => bb.putInt(k.length); bb.put(k); bb.putLong(v) }
    Files.write(java.nio.file.Paths.get(path), bb.array())
  }
}

object NgramLmModel {
  def load(path: String): NgramLmModel = {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length >= 24, s"$path: truncated artifact header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "GNLM",
      s"$path is not an NgramLm artifact")
    val scale = bb.getInt
    val vocab = bb.getInt
    val q0 = bb.getLong
    def readMap(): java.util.HashMap[String, java.lang.Long] = {
      val n = bb.getInt
      require(n >= 0 && n <= (1 << 24), s"$path: implausible table size $n")
      val m = new java.util.HashMap[String, java.lang.Long](n * 2)
      var i = 0
      while (i < n) {
        val kl = bb.getInt
        require(kl > 0 && kl <= 64 && bb.remaining() >= kl + 8,
          s"$path: truncated gram entry")
        val kb = new Array[Byte](kl)
        bb.get(kb)
        m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
          java.lang.Long.valueOf(bb.getLong))
        i += 1
      }
      m
    }
    val g3 = readMap()
    val g2 = readMap()
    require(bb.remaining() == 0, s"$path: trailing bytes")
    NgramLmModel(scale, vocab, g3, g2, q0)
  }
}

object NgramLm {

  val Scale = 1024

  /** Count trigrams/contexts of the training corpus (each sentence
    * preprocessed through the SAME seam as scoring) and quantize the
    * smoothed log-probs. Deterministic: counting + StrictMath.
    */
  def train(corpus: Seq[String], scale: Int = Scale): NgramLmModel = {
    val c3 = new java.util.HashMap[String, java.lang.Long]()
    val c2 = new java.util.HashMap[String, java.lang.Long]()
    val vocabSet = new java.util.HashSet[Integer]()
    corpus.foreach { raw =>
      val s = LangIdModel.joinedLocal(raw)
      var i = 0
      while (i < s.length) {
        vocabSet.add(s.codePointAt(i))
        i = s.offsetByCodePoints(i, 1)
      }
      var a = 0
      var b = if (a < s.length) s.offsetByCodePoints(a, 1) else s.length
      var c = if (b < s.length) s.offsetByCodePoints(b, 1) else s.length
      while (c < s.length) {
        val d = s.offsetByCodePoints(c, 1)
        c3.merge(s.substring(a, d), java.lang.Long.valueOf(1L),
          (x: java.lang.Long, y: java.lang.Long) =>
            java.lang.Long.valueOf(x.longValue + y.longValue))
        c2.merge(s.substring(a, c), java.lang.Long.valueOf(1L),
          (x: java.lang.Long, y: java.lang.Long) =>
            java.lang.Long.valueOf(x.longValue + y.longValue))
        a = b; b = c; c = d
      }
    }
    val v = vocabSet.size
    require(v > 1, "degenerate training vocabulary")
    def qlp(num: Long, den: Long): Long =
      math.floor(scale.toDouble *
        (StrictMath.log(num.toDouble / den.toDouble) / StrictMath.log(2.0))).toLong
    val g3 = new java.util.HashMap[String, java.lang.Long](c3.size * 2)
    val it3 = c3.entrySet().iterator()
    while (it3.hasNext) {
      val e = it3.next()
      val ctx = {
        val g = e.getKey
        // context = the gram minus its LAST code point
        g.substring(0, g.offsetByCodePoints(0, 2))
      }
      g3.put(e.getKey,
        java.lang.Long.valueOf(qlp(e.getValue.longValue + 1L, c2.get(ctx).longValue + v)))
    }
    val g2 = new java.util.HashMap[String, java.lang.Long](c2.size * 2)
    val it2 = c2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      g2.put(e.getKey, java.lang.Long.valueOf(qlp(1L, e.getValue.longValue + v)))
    }
    NgramLmModel(scale, v, g3, g2, qlp(1L, v.toLong))
  }

  /** The embedded reference corpus: the fluent-English half of the
    * LangId training set — the LM scores how "reference-like" text is,
    * so head buckets select fluent English and tail buckets catch
    * noise/other-script docs.
    */
  def referenceCorpus: Seq[String] =
    LangId.trainExamples.collect { case ("en", t) => t }

  /** THE production model: trained once per JVM, round-tripped through
    * the binary artifact (atomic tmp+rename on a pid-unique path — the
    * r20 LangId.fixture concurrency rule), memoized.
    */
  lazy val fixture: NgramLmModel = {
    val m = train(referenceCorpus)
    val dir = new java.io.File(sys.props("java.io.tmpdir"))
    val live = new java.io.File(dir,
      s"graft_ngramlm_fixture_${java.lang.ProcessHandle.current().pid()}.bin")
    val tmp = new java.io.File(live.getAbsolutePath + ".tmp")
    m.save(tmp.getAbsolutePath)
    java.nio.file.Files.move(tmp.toPath, live.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    live.deleteOnExit()
    NgramLmModel.load(live.getAbsolutePath)
  }

  // ---- DuckDB oracle generation (from the SAME model object) ----

  /** DuckDB single-quoted string literal (shared with the query layer —
    * bare '$s' interpolation breaks on apostrophes, which are routine
    * in fluent English sentences).
    */
  private[graft] def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The (gram, qlp) lookup relations as literal zipped unnests —
    * hoisted into MATERIALIZED CTEs by the caller (the r19 280×
    * inline-literal lesson).
    */
  def gramTablesSql(m: NgramLmModel): (String, String) = {
    import scala.jdk.CollectionConverters._
    val e3 = m.g3.asScala.toSeq.sortBy(_._1).map(e => (e._1, e._2.longValue()))
    val e2 = m.g2.asScala.toSeq.sortBy(_._1).map(e => (e._1, e._2.longValue()))
    def tbl(es: Seq[(String, Long)], kCol: String) =
      s"SELECT unnest(${es.map(e => sq(e._1)).mkString("[", ", ", "]")}) AS $kCol, " +
        s"unnest(${es.map(_._2).mkString("[", ", ", "]")}) AS q"
    (tbl(e3, "g"), tbl(e2, "c"))
  }

  /** Oracle chain over a docs relation exposing (doc_id, text) plus any
    * passthrough columns: produces CTE `lm_doc` with every docs column
    * plus (lm_q, n_grams, ppl_q). Trigram windows are CODE-POINT
    * indexed (DuckDB substr) exactly like the kernel; the unseen-
    * context default rides through the two left joins' coalesce.
    */
  def scoredSql(m: NgramLmModel, docsSql: String): String = {
    val (t3, t2) = gramTablesSql(m)
    s"""
      WITH lm_docs AS MATERIALIZED ($docsSql),
      lm_g3 AS MATERIALIZED ($t3),
      lm_g2 AS MATERIALIZED ($t2),
      lm_s AS (
        SELECT *, array_to_string(${graft.core.Tok.sqlWords("text")}, ' ') AS s
        FROM lm_docs),
      lm_tri AS (
        SELECT doc_id, unnest([substr(s, i, 3)
                 for i in generate_series(1, greatest(len(s) - 2, 0))]) AS g
        FROM lm_s),
      lm_hit AS (
        SELECT t.doc_id, coalesce(l3.q, l2.q, ${m.q0}) AS q
        FROM lm_tri t
        LEFT JOIN lm_g3 l3 ON t.g = l3.g
        LEFT JOIN lm_g2 l2 ON substr(t.g, 1, 2) = l2.c),
      lm_sum AS (
        SELECT doc_id, CAST(sum(q) AS BIGINT) AS lm_q,
               CAST(count(*) AS BIGINT) AS n_grams
        FROM lm_hit GROUP BY doc_id),
      lm_doc AS (
        SELECT d.*, coalesce(m.lm_q, 0) AS lm_q,
               coalesce(m.n_grams, 0) AS n_grams,
               CAST(CASE WHEN coalesce(m.n_grams, 0) = 0 THEN 0
                    ELSE -(((-coalesce(m.lm_q, 0)) * ${m.scale})
                           // coalesce(m.n_grams, 0)) END AS BIGINT) AS ppl_q
        FROM lm_docs d LEFT JOIN lm_sum m USING (doc_id))"""
  }

  /** Per-sentence ppl_q of the reference corpus itself (the scorer's
    * own arithmetic — truncating division on the non-negative
    * decomposition, the r12 rule).
    */
  def refPplQ(m: NgramLmModel): Seq[Long] =
    referenceCorpus.map { t =>
      val (q, n) = m.scoreJoined(LangIdModel.joinedLocal(t))
      if (n == 0) 0L else -((-q) * m.scale / n)
    }

  /** Fixed bucket thresholds from the REFERENCE distribution (the
    * CCNet posture: cutoffs are model constants, so bucketing stays a
    * pure per-row map — no global sort/window at 100 TB). Semantics
    * measured on the fixture (ppl_q units are scale² per bit/gram):
    * the trained reference sentences score −3.0..−3.7 bits/gram,
    * held-out fluent English −3.5..−3.9, other Latin languages and
    * English word soup −4.0..−4.7, and OOV-script/noise docs pin to
    * the all-unseen floor q0·scale ≈ −4.87 bits/gram. So:
    * head = at or above the WORST reference sentence (within the
    * reference distribution), tail = more than 1 bit/gram below it
    * (q0-dominated), middle = the band between.
    */
  def thresholds(m: NgramLmModel): (Long, Long) = {
    val tHi = refPplQ(m).min
    (tHi - m.scale.toLong * m.scale.toLong, tHi)
  }
}

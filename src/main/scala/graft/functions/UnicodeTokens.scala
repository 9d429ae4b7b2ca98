package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Script-aware tokenizer — the r16 verdict's top item: the whole text
  * family splits on `\s+`, so a CJK/Thai document is ONE token and
  * dedup grams, TF-IDF, Gopher stats and BPE word-splitting all degrade
  * to per-document no-ops on non-whitespace scripts (~50% of real web
  * corpora). This kernel segments by codepoint class in one unboxed
  * pass:
  *
  *  - SEPARATORS: the ASCII whitespace class both engines' `\s`
  *    matches ([ \t\n\v\f\r]) plus U+3000 IDEOGRAPHIC SPACE (the CJK
  *    space — NOT in `\s` on either engine, so it is listed
  *    explicitly). Deliberately NOT Character.isWhitespace: its set
  *    (U+2000 family etc.) diverges from RE2's `\s`, and the DuckDB
  *    oracle must replay the segmentation exactly.
  *  - SINGLETON SCRIPTS (Han, Hiragana, Katakana, Thai — the major
  *    unsegmented scripts): every codepoint is its own token, the
  *    standard character-tokenization fallback (what CJK analyzers and
  *    fastText-style pipelines do absent a dictionary segmenter). Thai
  *    combining vowels/tone marks carry script=Thai and so tokenize as
  *    their own codepoints — codepoint segmentation, not grapheme
  *    clustering, identically on both engines.
  *  - everything else: maximal runs of non-separator non-singleton
  *    codepoints (the old `\s+` behavior — pure-ASCII text tokenizes
  *    EXACTLY as before, so adopting this tokenizer changes nothing on
  *    whitespace-script corpora).
  *
  * The DuckDB oracle replays it as ONE RE2 regex (an independent
  * implementation — a stronger cross-check than regex-vs-regex):
  * `regexp_extract_all(t, '[\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}]|` +
  * `[^\s\x{3000}\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}]+')`.
  * Script-class membership must agree between java.lang.Character
  * .UnicodeScript (JDK17 ≈ Unicode 13) and DuckDB's RE2 — true for the
  * established ranges these scripts have occupied for many Unicode
  * versions; chars added in newer Unicode versions could diverge, which
  * is a fixture-design constraint, not a runtime hazard.
  *
  * Lowercasing is the CALLER's step (`lower(col)` before this) — kept
  * out of the kernel so the segmentation is case-independent and the
  * oracle mirrors it with SQL `lower`.
  *
  * INDIC / COMBINING-MARK segmentation (r17 verdict #8, decided r18 —
  * documented behavior, pinned by UnicodeTokensSpec):
  *  - Indic scripts (Devanagari, Bengali, Tamil, …) are RUN-tokenized:
  *    they are space-separated scripts, and their combining matras
  *    carry the same script class as their base consonants, so a word
  *    like "हिन्दी" stays ONE token with every matra attached. No
  *    special casing needed — the run rule is already correct.
  *  - Script=INHERITED combining marks (U+0300 diacritics, U+3099
  *    kana voicing marks) belong to no singleton class on EITHER
  *    engine (java.lang.Character and RE2 agree they are not
  *    Han/Hiragana/Katakana/Thai), so a DECOMPOSED kana like
  *    か + U+3099 tokenizes as the base singleton plus a separate
  *    mark-run token, while the NFC form が is one singleton. Callers
  *    feeding decomposed text should NFC-normalize first (real web
  *    corpora are overwhelmingly NFC); the kernel does not normalize
  *    because DuckDB's RE2 replay could not reproduce ICU
  *    normalization and the cross-engine witness would break.
  *  - Full ICU grapheme clustering is deliberately OUT: its rules are
  *    not expressible as one RE2 regex, so adopting it would forfeit
  *    the independent-oracle replay that gates this kernel.
  *
  * Reference has no text operators; this serves the LLM-training-data
  * brief (multilingual corpus curation at 100 TB).
  */
case class UnicodeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_tokens needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnicodeTokens.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeTokens =
    copy(child = newChild)
}

object UnicodeTokens {

  def apply(col: Column): Column =
    GraftColumnBridge.toColumn(UnicodeTokens(GraftColumnBridge.toExpression(col)))

  private def isSep(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
      cp == '\f' || cp == 0x0B || cp == 0x3000

  /** Singleton-script membership. Public so oracle-side helpers and
    * specs classify identically.
    */
  def isSingleton(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    (s eq Character.UnicodeScript.HAN) ||
      (s eq Character.UnicodeScript.HIRAGANA) ||
      (s eq Character.UnicodeScript.KATAKANA) ||
      (s eq Character.UnicodeScript.THAI)
  }

  def compute(s: UTF8String): ArrayData = {
    // one java String per row: codepoint classification needs chars,
    // and the tokens are fresh UTF8Strings anyway — the allocation is
    // the same order as the output
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[UTF8String](16)
    var i = 0
    var runStart = -1
    def flushRun(end: Int): Unit = if (runStart >= 0) {
      out.add(UTF8String.fromString(str.substring(runStart, end)))
      runStart = -1
    }
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (isSep(cp)) flushRun(i)
      else if (isSingleton(cp)) {
        flushRun(i)
        out.add(UTF8String.fromString(str.substring(i, i + w)))
      } else if (runStart < 0) runStart = i
      i += w
    }
    flushRun(n)
    new GenericArrayData(out.toArray)
  }

  /** Driver/JVM-side twin of [[compute]] for replay benches and plain-
    * Scala ground-truth loops (StreamDedupReplayBench et al.) — runs
    * the SAME kernel, so it cannot drift from the Column form
    * (UnicodeTokensSpec pins equality with the legacy split on ASCII).
    */
  def tokenizeLocal(s: String): Array[String] = {
    val arr = compute(UTF8String.fromString(s))
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i).toString)
  }

  /** The RE2 token pattern the DuckDB oracle uses — kept next to the
    * kernel so the two class definitions can never drift apart
    * silently (oracle SQL is generated from this constant).
    */
  val Re2Pattern: String =
    "[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}]|" +
      "[^\\s\\x{3000}\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}]+"

  /** Java-regex form of the singleton class (for Spark-side rlike
    * filters over already-produced tokens).
    */
  val JavaSingletonPattern: String =
    "^[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}]$"

  /** RE2 form of the singleton class (full-match in DuckDB). */
  val Re2SingletonPattern: String =
    "[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}]"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — the caller-side
  * step the tokenizer seam documents (UnicodeTokens scaladoc, r18):
  * script=INHERITED combining marks (U+3099 kana voicing, U+0301
  * combining acute, …) split away from their singleton-script bases
  * under codepoint segmentation, so DECOMPOSED kana / Latin diacritics
  * must be composed BEFORE tokenization. The r18 verdict's item 2: the
  * decision existed but no caller could act on it because the engine
  * had no NFC expression.
  *
  * Implementation: java.text.Normalizer (Form.NFC) — the JDK's Unicode
  * normalizer. The DuckDB oracle replays it as `nfc_normalize(s)`
  * (utf8proc) — two INDEPENDENT implementations of UAX #15, so the
  * cross-engine gate (q218) is a real conformance cross-check, not a
  * regex replay. Agreement verified over the fixture alphabet incl.
  * Hangul jamo composition and a Devanagari composition EXCLUSION
  * (U+0915 U+093C stays decomposed — NFC is not naive compose-all).
  *
  * Fast path: Normalizer.isNormalized short-circuits the (dominant)
  * already-NFC case without allocating; total on every non-null string.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NfcNormalize needs string, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Driver-side twin (spec use). */
  def local(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(NfcNormalize(GraftColumnBridge.toExpression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PRODUCTION-DEPTH BPE segmentation kernel: apply a trained merge
  * table to one token as a LOOP over the merges inside one codegen
  * call — semantically identical to
  * [[graft.operators.BpeTrainer.segment]]'s chained literal replaces
  * (mark every code point with chr(1), then per merge replace
  * M+a+M+b → M+ab, left-to-right non-overlapping — both
  * java.lang.String.replace and Spark's StringReplace scan that way),
  * but with CONSTANT expression depth. The chained-Column form builds
  * a merge-count-deep expression tree: at 1000 merges the
  * ColumnNode→Expression conversion recursion overflows the driver
  * stack before analysis even starts (measured r20), and a 30k-vocab
  * production table is 30× deeper still. A real tokenizer applies its
  * merge table as data, not as plan structure — this kernel carries
  * the table as a codegen reference object (the LangIdScores /
  * NgramLmScore artifact posture: loaded once per executor, never per
  * row).
  *
  * [[graft.operators.BpeTrainer.encode]] switches to this kernel past
  * 64 merges; BpeApplyMergesSpec pins kernel ≡ chained-segment
  * equality on the macro corpus shapes.
  */
case class BpeApplyMerges(child: Expression,
    searches: Array[String], targets: Array[String])
    extends UnaryExpression {

  require(searches.length == targets.length, "merge table shape")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BpeApplyMerges needs string, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeApplyMerges.compute(searches, targets, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("bpeSearches", searches,
      classOf[Array[String]].getName)
    val t = ctx.addReferenceObj("bpeTargets", targets,
      classOf[Array[String]].getName)
    val cls = BpeApplyMerges.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($s, $t, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

object BpeApplyMerges {

  /** chr(1)-mark every code point, then apply the merge table in
    * order. String.replace is literal, left-to-right, non-overlapping
    * — the exact semantics of the chained form.
    */
  def compute(searches: Array[String], targets: Array[String],
      tok: UTF8String): UTF8String = {
    val str = tok.toString
    val sb = new java.lang.StringBuilder(str.length * 2)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sb.append('\u0001')
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    var cur = sb.toString
    var k = 0
    while (k < searches.length) {
      // contains-first: most merges never hit a given token, and
      // String.replace allocates a regex-free scan anyway — the
      // indexOf pre-check skips the allocation path on misses
      if (cur.contains(searches(k))) cur = cur.replace(searches(k), targets(k))
      k += 1
    }
    UTF8String.fromString(cur)
  }

  def apply(c: Column, merges: Seq[graft.operators.BpeTrainer.MergeStep])
      : Column = {
    val m = graft.operators.BpeTrainer.M
    GraftColumnBridge.toColumn(BpeApplyMerges(
      GraftColumnBridge.toExpression(c),
      merges.map(s => m + s.a + m + s.b).toArray,
      merges.map(s => m + s.a + s.b).toArray))
  }
}

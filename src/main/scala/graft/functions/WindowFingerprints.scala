package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing every `span`-token Karp-Rabin
  * window fingerprint of a pre-hashed token array in one unboxed pass.
  *
  * Semantically identical to
  * `transform(sequence(1, greatest(n - span + 1, 1)), i ->
  *    aggregate(slice(hs, i, span), 0L, (acc, h) -> (acc*1000003 + h) % p))`
  * (q57/q98's proven cross-engine fold recipe, p = 2147483647), but the
  * builtin form allocates a slice per window and boxes every element —
  * O(n·span) boxed longs per document. Here it is a primitive nested
  * while-loop (same arithmetic, same O(n·span) work, zero allocation
  * beyond the output), one static call per row inside whole-stage
  * codegen. Inputs shorter than `span` yield one fingerprint of the
  * whole (possibly empty) array — total, so optimizer-inferred
  * predicates can evaluate it on rows an upstream size filter drops
  * (the q98 CSE lesson).
  */
case class WindowFingerprints(child: Expression, span: Int)
    extends UnaryExpression {
  require(span >= 1, s"WindowFingerprints needs span >= 1, got $span")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WindowFingerprints.compute(input.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowFingerprints.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $span)")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowFingerprints =
    copy(child = newChild)
}

object WindowFingerprints {
  private val Mult = 1000003L
  private val Mod = 2147483647L

  def compute(arr: ArrayData, span: Int): ArrayData = {
    val n = arr.numElements()
    val nOut = math.max(n - span + 1, 1)
    val out = new Array[Long](nOut)
    var i = 0
    while (i < nOut) {
      var acc = 0L
      var j = i
      val end = math.min(i + span, n)
      while (j < end) {
        acc = (acc * Mult + arr.getLong(j)) % Mod
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column, span: Int): Column =
    GraftColumnBridge.toColumn(
      WindowFingerprints(GraftColumnBridge.toExpression(c), span))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact squared-L2 distance between two integer (long) vectors as one
  * fused unboxed loop — the hot kernel of the product-quantization path
  * (q157): codeword assignment and ADC table construction evaluate it
  * K times per (row, subspace). Integer accumulation is EXACTLY
  * order-independent, so the result is reproducible bit-for-bit in the
  * DuckDB oracle regardless of plan shape; doubles never appear. The
  * composed `aggregate(zip_with(...))` form would box every element
  * (the MinhashSignature/CosineSim lesson). Length mismatch → null,
  * matching zip_with's null padding through a fold.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqDistLong.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SqDistLong.getClass.getName.stripSuffix("$")
    // freshName so two fused copies never declare duplicate locals
    // (nullSafeExec adds no braces for non-nullable inputs; r13 advice)
    val r = ctx.freshName("sqDistResult")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $cls.sqDist($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Long) $r).longValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  /** Boxed Long so codegen can signal null on length mismatch. Callers
    * must keep |element| ≤ ~2^26 so the d² sum stays far from overflow
    * (the PQ path's quantized values are ≤ ~2·10⁴ → sums ≤ ~2·10¹⁰).
    */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(SqDistLong(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}

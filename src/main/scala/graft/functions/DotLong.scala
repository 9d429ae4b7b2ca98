package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact dot product of two integer (long) vectors as one fused unboxed
  * loop — [[SqDistLong]]'s inner-product twin, the hot kernel of the
  * exact-integer cosine family (q144's assignment crossJoin and
  * in-cluster pair scan evaluate it once per (row, centroid) and once
  * per candidate pair). Integer accumulation is EXACTLY
  * order-independent, so the result is reproducible bit-for-bit in the
  * DuckDB oracle regardless of plan shape. The composed
  * `aggregate(zip_with(...))` form boxes every element (the
  * MinhashSignature/CosineSim lesson). Length mismatch → null, matching
  * zip_with's null padding through a fold. Callers keep |element| ≤
  * ~2^26 so products stay far from Long overflow (q144's quantized
  * values are ≤ 1.1·10⁴ → pair dots ≤ 7·10⁹).
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLong.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DotLong.getClass.getName.stripSuffix("$")
    // freshName, not a fixed local: with non-nullable inputs nullSafeExec
    // adds no scoping braces, so two fused copies of this expression in
    // one codegen function would otherwise declare duplicate locals and
    // fall back to interpreted mode (round-13 advice)
    val r = ctx.freshName("dotResult")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $cls.dot($a, $b);
      if ($r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ((java.lang.Long) $r).longValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Boxed Long so codegen can signal null on length mismatch. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(DotLong(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}

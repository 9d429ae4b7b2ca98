package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity as a single codegen Expression with one fused
  * primitive loop — the hot kernel of the whole ANN family (brute,
  * IVF probe, SQ8, feature-embed). The composed
  * `aggregate(zip_with(...))` form this replaces allocates a boxed
  * intermediate array and three lambda frames per ROW; the
  * MinhashSignature lesson (202 s → 56 s on the 1M-doc macro) is that
  * unboxed while-loops are the difference at data scale.
  *
  * Numeric contract: bit-identical to the previous plan shape — dot,
  * |a|² and |b|² are independent left folds in element order (the fused
  * loop keeps three separate accumulators, so association is unchanged)
  * and float inputs are widened per element exactly as `zip_with`'s
  * per-element double casts did. Length mismatch → null, matching
  * zip_with's null padding which propagated null through the fold.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineSim.getClass.getName.stripSuffix("$")
    // freshName so two fused copies never declare duplicate locals
    // (nullSafeExec adds no braces for non-nullable inputs; r13 advice)
    val r = ctx.freshName("cosineResult")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $cls.cosine($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $r).doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Boxed Double so codegen can signal null on length mismatch. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(CosineSim(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the pandas `astype(str)` shortest
  * decimal form of a double that has already been rounded to `scale`
  * decimals: "2.45" not "2.450", "-18.0" not "-18".
  *
  * This is the WKT float-formatting oracle of the reference
  * (test_transforms.py:4203-4214) as a single codegen'd expression —
  * replaces a decimal-cast + two regexp_replace chain in the geometry hot
  * path, and demonstrates the custom-Expression extension surface
  * (SURVEY §7.3). Stays inside whole-stage codegen via a static helper
  * call; no UDF serialization boundary.
  */
case class PandasFloatString(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PandasFloatString.format(input.asInstanceOf[Double], scale))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PandasFloatString.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($cls.format($c, $scale))")
  }

  override protected def withNewChildInternal(newChild: Expression): PandasFloatString =
    copy(child = newChild)
}

object PandasFloatString {

  /** Round `d` to `scale` decimals (HALF_UP) and render with trailing
    * zeros stripped but at least one fractional digit, matching pandas'
    * str() of a float that carries `scale` decimals.
    */
  def format(d: Double, scale: Int): String = {
    val bd = new java.math.BigDecimal(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros()
    val plain = bd.toPlainString
    if (plain.indexOf('.') < 0) plain + ".0" else plain
  }

  /** Column-level entry point. */
  def apply(c: Column, scale: Int): Column =
    GraftColumnBridge.toColumn(
      PandasFloatString(GraftColumnBridge.toExpression(c), scale))
}

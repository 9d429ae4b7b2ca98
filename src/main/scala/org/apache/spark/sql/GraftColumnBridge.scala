package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression converters, so graft's
  * custom Catalyst expressions can surface as user-facing Columns
  * (Spark 4 removed the public `new Column(expr)` constructor).
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

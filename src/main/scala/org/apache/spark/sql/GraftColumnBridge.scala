package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark 4's private[sql] Column<->Expression
  * converters, so graft's custom Catalyst expressions can be exposed as
  * Columns (the pre-4.0 `new Column(expr)` constructor is gone).
  */
object GraftColumnBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for registering custom Catalyst expressions from library
  * code: Spark 4 moved Column<->Expression conversion behind
  * private[sql] (classic.ExpressionUtils), so extensions provide this
  * one-file shim in the org.apache.spark.sql package — the standard
  * pattern for third-party expression libraries.
  */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

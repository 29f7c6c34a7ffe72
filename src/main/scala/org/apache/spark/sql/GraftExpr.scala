package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for building a classic [[Column]] from a custom Catalyst
  * [[Expression]] (the constructor is private[sql] since the Connect
  * refactor). Lives in the org.apache.spark.sql package solely for access;
  * graft code calls [[GraftExpr.column]].
  */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

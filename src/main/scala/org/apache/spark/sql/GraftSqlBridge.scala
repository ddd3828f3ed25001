package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ catalyst-Expression conversions —
  * the standard technique for extension libraries that ship custom Catalyst
  * expressions (Spark 4 removed the public `new Column(expr)` constructor in
  * favour of connect-agnostic column nodes).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

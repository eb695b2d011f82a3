package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion — the
  * standard pattern for Spark-native extension libraries that define custom
  * Catalyst expressions (Spark 4 moved `new Column(expr)` behind
  * `classic.ExpressionUtils`). Nothing else from the private API is used.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

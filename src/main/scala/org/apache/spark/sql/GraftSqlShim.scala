package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's private[sql] Column↔Expression conversion —
  * the supported way to expose a custom Catalyst Expression as a
  * user-facing Column without going through the function registry.
  * Lives in the org.apache.spark.sql package solely for access. */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

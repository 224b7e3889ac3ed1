package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so this one-file shim lives
  * in the Spark SQL package — the conventional pattern for Spark extension
  * libraries that construct Columns from custom expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

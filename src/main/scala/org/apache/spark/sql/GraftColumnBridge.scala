package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft can expose
  * native Catalyst expressions through the public Column API — the
  * standard technique Spark extension libraries use since the sql-api /
  * classic split. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

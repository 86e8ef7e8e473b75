package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters so graft's
  * native Catalyst expressions (graft.expressions.*) can be used as
  * Columns. This is the classic-API equivalent of what
  * `functions.udf`/`Column.fn` do internally; no Spark internals are
  * modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

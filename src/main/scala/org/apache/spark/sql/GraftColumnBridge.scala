package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters — the
  * standard package-escape pattern for libraries that ship custom Catalyst
  * expressions with a typed Column API (Spark 4 routes Columns through
  * ColumnNode, so `new Column(expr)` no longer exists).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

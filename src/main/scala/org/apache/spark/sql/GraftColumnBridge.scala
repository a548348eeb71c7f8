package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * one sanctioned way for a library shipping custom Catalyst
  * expressions (that carry non-SQL-encodable state, e.g. a centroid
  * table) to lift them into the public Column API on Spark 4.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

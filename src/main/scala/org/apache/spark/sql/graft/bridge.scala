package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the converters
  * `private[sql]` (Connect refactor), so extension libraries host a
  * one-file bridge inside the org.apache.spark.sql package — the same
  * pattern used by open-source Spark extensions. No Spark internals are
  * modified; this only re-exports two conversions.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

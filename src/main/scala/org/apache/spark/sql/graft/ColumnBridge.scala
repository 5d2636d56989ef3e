package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters — the
  * documented extension-library technique for exposing custom Catalyst
  * expressions as user-facing `Column`s in Spark 4 (where `new
  * Column(expr)` no longer exists). Lives under `org.apache.spark.sql` only
  * to satisfy the access scope; contains no Spark internals of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

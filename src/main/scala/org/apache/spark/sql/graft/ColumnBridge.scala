package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode for Connect; classic conversions
  * live in `org.apache.spark.sql.classic`). Standard extension-library
  * pattern: a tiny shim inside the `org.apache.spark.sql` namespace, so
  * the engine's custom Catalyst expressions (graft.functions.*) can expose
  * a public `Column` API without forking Spark.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

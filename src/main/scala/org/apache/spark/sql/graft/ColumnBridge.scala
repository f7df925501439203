package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  /** Analyzed logical plan of a DataFrame. */
  def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession, p: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], p)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way for libraries to expose custom Catalyst expressions
  * as user-facing Columns on Spark 4 (Column no longer carries `.expr`). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a catalyst Expression (the plain
    * [[expression]] wrapper is LAZY — a `ColumnNodeExpression` holding the
    * non-serializable internal column node, which breaks when captured in
    * an executor closure; this runs the classic converter up front so
    * `.desc`/`.asc` columns become real catalyst `SortOrder`s). */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * operators on top of it). */
  def analyzedPlan(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (runs the analyzer). */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

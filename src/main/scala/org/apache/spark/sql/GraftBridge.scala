package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  * Spark 4 moved these conversions behind private[sql] (classic
  * ExpressionUtils); a one-file shim in the sql package is the supported
  * pattern for libraries shipping native expressions without a
  * FunctionRegistry round-trip. */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom logical plan (classic Dataset.ofRows is
    * private[sql]) — the entry point for injected plan nodes. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

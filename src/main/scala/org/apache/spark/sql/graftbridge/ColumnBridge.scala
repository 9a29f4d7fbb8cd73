package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the supported
  * internal hook (ExpressionUtils) is private[sql], so this bridge lives in
  * the org.apache.spark.sql namespace to expose Column↔Expression conversion
  * to graft's custom Catalyst expressions. Public-API-only alternative
  * (FunctionRegistry + call_function) costs per-session registration.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` is likewise private[sql]: the hook for running a
    * custom [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
    * node (graft.plans.TopKPerKey) through the analyzer/planner. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

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
}

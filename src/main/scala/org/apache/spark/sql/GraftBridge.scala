package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  * Spark 4 made these conversions private[sql] (Column became
  * connect-agnostic), so third-party expressions provide a shim in the
  * sql package — the standard extension pattern. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to an existing
    * session (normally done at builder time; exposed for sessions that
    * already exist, e.g. tests). */
  def registerInjectedFunctions(ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}

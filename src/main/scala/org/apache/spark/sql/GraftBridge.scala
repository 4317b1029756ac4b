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

  /** DataFrame from a custom LogicalPlan node (Dataset.ofRows is
    * private[sql] in Spark 4) — how graft's whole-operator plans
    * (e.g. the native as-of join) enter the DataFrame API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame — the resolved child for
    * custom plan construction. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

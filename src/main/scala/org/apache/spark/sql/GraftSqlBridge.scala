package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column↔Expression
  * converters, needed to expose custom Catalyst expressions as
  * user-facing Columns (the SURVEY §7.3 extension path). Kept to two
  * one-liners; everything else lives in graft.* packages.
  */
object GraftSqlBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Apply a SparkSessionExtensions' injected functions to an
    * EXISTING session's registry (`registerFunctions` is
    * private[sql]) — lets specs exercise the
    * `spark.sql.extensions=graft.sqlext.GraftExtensions` config path
    * without tearing down the shared test session. */
  def applyInjectedFunctions(ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(
      spark.sessionState.functionRegistry.asInstanceOf[
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
}

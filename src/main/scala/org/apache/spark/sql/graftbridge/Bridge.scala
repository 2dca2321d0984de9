package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4's Column wraps a connect-compatible ColumnNode; the conversion
  * helpers (`org.apache.spark.sql.classic.ExpressionUtils`) are
  * `private[sql]`, so this one-file shim lives under the `org.apache.spark
  * .sql` package tree — the standard pattern for libraries shipping native
  * Catalyst expressions against the classic API.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (classic `Dataset.ofRows` is
    * `private[sql]`) — the entry point for custom logical nodes like
    * [[graft.plans.AssignPartitions]]. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Block until every queued listener event has been delivered
    * (`LiveListenerBus.waitUntilEmpty` is `private[spark]`) — lets programs
    * that assert on listener-accumulated metrics drain deterministically
    * instead of sleeping and hoping stragglers arrived. */
  def waitUntilListenerBusEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** ANSI division-by-zero error, exactly the exception `Divide` raises
    * (QueryExecutionErrors is `private[sql]`; codegen calls this via the
    * static forwarder `org.apache.spark.sql.graftbridge.Bridge.divideByZeroError`). */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}

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

  /** ANSI division-by-zero error, exactly the exception `Divide` raises
    * (QueryExecutionErrors is `private[sql]`; codegen calls this via the
    * static forwarder `org.apache.spark.sql.graftbridge.Bridge.divideByZeroError`). */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}

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

  /** Cap the inherited size estimate of every checkpointed `LogicalRDD`
    * leaf in `df`'s plan at `capBytes`.
    *
    * Why this exists (r11): `Dataset.localCheckpoint`/`checkpoint` preserve
    * the ORIGIN plan's `Statistics` on the resulting `LogicalRDD`
    * (`LogicalRDD.fromDataset`) so downstream planning keeps good
    * estimates. In an ITERATIVE checkpoint loop (connected components:
    * join → agg → checkpoint per round) that inheritance COMPOUNDS — each
    * round's join estimate multiplies the inherited sizes, the next
    * checkpoint inherits the product, and the `BigInt` size estimate grows
    * doubly-exponentially in rounds. By round ~14 the estimates hold
    * millions of bits and Catalyst's `SizeInBytesOnlyStatsPlanVisitor`
    * spends MINUTES inside `BigInteger.multiplyToomCook3` per planning
    * pass (observed live: the sf1 band-local cluster leg pinned one core
    * for 12+ minutes inside stats estimation — jstack'd mid-grind).
    *
    * The cap keeps small frames' real estimates (broadcast decisions
    * intact) and clamps anything above `capBytes`, so a k-round loop's
    * estimates are bounded by cap²·|plan| per round instead of
    * size^(2^k). Leaves partitioning/ordering/constraints untouched.
    *
    * Implementation note: this matches the plan ROOT only — a checkpointed
    * Dataset's analyzed plan IS the `LogicalRDD` leaf — because
    * `plan.transform` CANNOT swap the node: `LogicalRDD`'s curried second
    * parameter list (session/stats/constraints) is excluded from case-class
    * equality, so `fastEquals` judges the stats-modified replacement equal
    * to the original and transform keeps the OLD node (silently — found the
    * hard way). A non-root `LogicalRDD` is left untouched and the frame
    * returned as-is. */
  def capRddStats(
      df: org.apache.spark.sql.DataFrame,
      capBytes: BigInt = BigInt("1000000000000000") /* 1 PB */)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    df.queryExecution.analyzed match {
      case l: LogicalRDD if l.stats.sizeInBytes > capBytes =>
        // keep the origin plan's constraints (e.g. not-null) — only the
        // Statistics are being replaced. `l.constraints` IS the
        // originConstraints view (filtered to the output set), so passing
        // it back through preserves exactly what the origin plan proved.
        classic.Dataset.ofRows(spark,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(spark,
            Some(Statistics(sizeInBytes = capBytes)), Some(l.constraints)))
      case _ => df
    }
  }

  /** ANSI division-by-zero error, exactly the exception `Divide` raises
    * (QueryExecutionErrors is `private[sql]`; codegen calls this via the
    * static forwarder `org.apache.spark.sql.graftbridge.Bridge.divideByZeroError`). */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}

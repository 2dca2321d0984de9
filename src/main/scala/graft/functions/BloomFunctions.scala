package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Column-API surface over Spark's INTERNAL bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime join pruning, not registered as SQL functions in 4.1).
  *
  * Why expose them: the membership-prefilter pattern. An exact semi-join
  * against a reference set has to move one side; a bloom filter of the
  * reference set is a few MB broadcast that turns candidate generation
  * into a MAP-ONLY predicate — no false negatives ever (every true match
  * survives), ~fpp false positives that a downstream exact join removes.
  * Net: the big side never shuffles non-candidates, and the result is
  * provably identical to the exact plan (see `decontaminate_bloom`,
  * whose oracle IS `decontaminate`'s).
  *
  * Both expressions want LongType input — hash with `xxhash64` on both
  * the build and probe sides (the same pairing Spark's own runtime
  * filtering injects).
  */
object BloomFunctions {

  /** Aggregate: build a bloom filter (binary) over a LongType column —
    * pass `xxhash64(col)`. `estimatedItems` sizes the filter (default
    * bits ≈ 8 per item, capped by
    * spark.sql.optimizer.runtime.bloomFilter.* confs). */
  def bloomFilterAgg(hashed: Column, estimatedItems: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(hashed), estimatedItems)
        .toAggregateExpression())

  /** Predicate: `hashed` (xxhash64 of the probe value) might be in
    * `bloom`. False ⇒ definitely absent; true ⇒ verify exactly.
    * `might_contain` requires its filter side to be a CONSTANT or scalar
    * subquery (it is bound once per query, not per row) — pass the 1-row
    * aggregate through [[scalar]]. */
  def mightContain(bloom: Column, hashed: Column): Column =
    Bridge.column(
      BloomFilterMightContain(Bridge.expression(bloom), Bridge.expression(hashed)))

  /** A 1-row/1-column DataFrame as a scalar subquery expression — the
    * form `might_contain` accepts for its filter side. */
  def scalar(df: org.apache.spark.sql.DataFrame): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        Bridge.logicalPlan(df)))

  /** [[BloomMightContainBroadcast]] as a Column — the TORRENT-shipped twin
    * of [[mightContain]]. The scalar-subquery form binds the serialized
    * filter as a plan literal, so the full bitmap rides inside EVERY
    * downstream stage's task binary (measured: the registry's only
    * `Broadcasting large task binary` warnings, 2.5-3.7 MiB × 8 stages for
    * decontaminate_bloom at a 10⁶-item filter). At a 100 TB cluster's
    * stage × task counts that is real scheduler/RPC pressure. This form
    * serializes only a Broadcast HANDLE into the task binary; the bitmap
    * ships once per executor over the torrent protocol, exactly like a
    * broadcast-hash-join relation. Same no-false-negative contract. */
  def mightContainBroadcast(bf: Broadcast[Array[Byte]], hashed: Column): Column =
    Bridge.column(BloomMightContainBroadcast(bf, Bridge.expression(hashed)))
}

/** Bloom membership probe whose filter arrives via a [[Broadcast]] handle
  * instead of a plan literal (SURVEY §2.5 preference (b); see
  * [[BloomFunctions.mightContainBroadcast]] for why). `bytes` is the
  * serialized form produced by [[BloomFilterAggregate]] (collect the 1-row
  * aggregate, broadcast its binary cell); deserialization happens lazily
  * once per task from the executor-local broadcast block. */
case class BloomMightContainBroadcast(
    bcast: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG probe (xxhash64), got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "might_contain_broadcast"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bcast.value))

  /** Codegen entry point (the generated code holds this expression as a
    * reference object and calls through). */
  def filterValue(): BloomFilter = filter

  override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcastExpr", this,
      classOf[BloomMightContainBroadcast].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = $ref.filterValue().mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

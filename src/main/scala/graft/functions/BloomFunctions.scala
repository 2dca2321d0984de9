package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

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
}

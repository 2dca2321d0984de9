package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (the 100 TB story: a handful of buckets or
  * users carrying most of the traffic would pin single reducers).
  *
  * Spark's AQE skew-join handles sort-merge skew automatically when stats
  * reveal it; these utilities cover the cases AQE can't: replicated
  * broadcast-free joins against a *known-small* right side with a skewed
  * key, and pre-aggregation under a skewed group key.
  *
  * The when-to-salt boundary, machine-proven in AqeSkewJoinSpec: AQE's
  * OptimizeSkewedJoin fires on a sort-merge join whose runtime partition
  * stats exceed `skewedPartitionThresholdInBytes` and factor × median —
  * UNLESS the join's consumer requires the join key's partitioning (a
  * same-key groupBy downstream: the split would re-shuffle, so the rule
  * declines unless `forceOptimizeSkewedJoin` is set). Skewed aggregation
  * keys and forced-broadcast/shuffled-hash joins are never rewritten.
  * Those three cases — join-then-same-key-agg, skewed groupBy, replicated
  * small-side join — are what [[saltedAgg]]/[[saltedJoin]] are for.
  */
object SkewUtils {

  private val SaltCol = "__graft_salt"

  /** Salted equi-join: left rows are scattered over `salts` sub-keys (any
    * assignment works — correctness is invariant), the right side is
    * replicated once per salt, and the join key becomes (key, salt), so a
    * hot key's rows spread over `salts` reducers instead of one.
    * Result == plain inner join on `key`. Right side should be small
    * (replication factor = salts). */
  /** Deterministic per-row salt: hash of the full row content. Task retries
    * recompute the SAME salt for the same row (a monotonically_increasing_id
    * salt changes on re-execution — the SPARK-23207 class of silent
    * lost/duplicated rows after a shuffle-stage retry). Identical duplicate
    * rows share a salt, which only matters if a hot key's rows are also
    * byte-identical. */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn(SaltCol, rowSalt(left, salts))
    val replicatedRight = right.withColumn(SaltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase aggregation under a skewed group key: phase 1 aggregates on
    * (key, salt) — spreading a hot key over `salts` partial groups — and
    * phase 2 combines the partials per key. `partial` and `merge` must form
    * a semigroup (sum/sum, count/sum, min/min, max/max...). */
  def saltedAgg(
      df: DataFrame,
      key: String,
      salts: Int,
      partial: Column => Column,
      merge: Column => Column,
      valueCol: String,
      resultName: String
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol, rowSalt(df, salts))
      .groupBy(col(key), col(SaltCol))
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(merge(col("__partial")).as(resultName))
  }
}

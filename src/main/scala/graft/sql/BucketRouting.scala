package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{BucketLayout, BucketPriorityConfig}

/** The reference's produce-path semantics (§2.1 `bucket_of`, `route`,
  * `discard`) as declarative DataFrame transforms.
  *
  * Reference behavior being reproduced
  * (BucketPriorityPartitioner.java:61-94, Bucket.java:22-29,
  * DiscardPartitioner.java:15-18):
  *   - bucket_of(key): split on the delimiter REGEX, take token 0, trim; a
  *     configured bucket name ⇒ that bucket, else no bucket; null key ⇒ no
  *     bucket;
  *   - route: a message whose key resolves to a bucket goes to the bucket's
  *     next round-robin partition; an EMPTY bucket (over-allocation edge,
  *     BucketPriorityPartitionerTest.java:186-262) yields partition −1 ⇒ the
  *     message is silently discarded; no bucket ⇒ null partition (the
  *     reference returns UNKNOWN_PARTITION so engine-default placement
  *     applies);
  *   - discard: drop unroutable rows (documented DiscardPartitioner intent,
  *     README.md:77-84).
  *
  * Round-robin determinism: the reference's AtomicInteger counter order
  * depends on send order; distributed Spark has no global send order, so the
  * caller supplies an explicit ordering column (`seqCol`, e.g. `event_id`).
  * The uniformity invariant (≤1 message skew per partition within a bucket)
  * is identical; the exact message→partition byte order is defined by
  * `seqCol` instead of arrival time (SURVEY §7 risk register).
  *
  * Scale note (100 TB): [[route]] uses a window partitioned by bucket — with
  * a handful of buckets every bucket is one shuffle partition, which is the
  * correct *deterministic* semantics but skews at cluster scale. For massive
  * streams use [[routeUniform]], which keeps the same ≤1-skew uniformity
  * guarantee without any shuffle by round-robining per Spark task (offset by
  * a per-task salt), at the cost of a non-reproducible message→partition
  * order — exactly the guarantee profile of the reference under concurrent
  * producer threads (its AtomicInteger order is scheduling-dependent too).
  */
object BucketRouting {

  /** `bucket_of(key)` as a pure Column (no UDF — codegen-friendly). */
  def bucketOf(key: Column, cfg: BucketPriorityConfig): Column = {
    val first = trim(split(key, cfg.delimiter).getItem(0))
    when(key.isNotNull && first.isin(cfg.buckets: _*), first)
  }

  /** Chained CASE over the (tiny) bucket list: bucket name → value. */
  private def bucketCase[T](bucket: Column, mapping: Seq[(String, T)]): Column =
    mapping.foldLeft(lit(null).cast("int")) { case (acc, (name, v)) =>
      when(bucket === name, lit(v)).otherwise(acc)
    }

  /** Deterministic priority routing.
    *
    * Adds `bucket` (nullable string) and `pt` (nullable int):
    *   - known bucket, non-empty range → assigned partition (round-robin over
    *     the bucket's contiguous range, ordered by `seqCol`);
    *   - known bucket, EMPTY range     → −1 (to be discarded);
    *   - no bucket                     → null (engine-default placement).
    */
  def route(
      df: DataFrame,
      cfg: BucketPriorityConfig,
      numPartitions: Int,
      keyCol: Column,
      seqCol: Column
  ): DataFrame = {
    val ranges = BucketLayout.ranges(cfg, numPartitions) // (name,(start,size))
    val bucket = bucketOf(keyCol, cfg)
    val withBucket = df.withColumn("bucket", bucket)
    val start = bucketCase(col("bucket"), ranges.map { case (n, (s, _)) => (n, s) })
    val size = bucketCase(col("bucket"), ranges.map { case (n, (_, z)) => (n, z) })
    val rn = row_number().over(Window.partitionBy(col("bucket")).orderBy(seqCol))
    withBucket.withColumn(
      "pt",
      when(col("bucket").isNull, lit(null).cast("int"))
        .when(size === 0, lit(-1))
        .otherwise(start + (rn - lit(1)) % size))
  }

  /** Shuffle-free routing for cluster scale: same uniformity invariant, order
    * defined per Spark task rather than globally. Uses the task's partition id
    * as the round-robin salt so concurrent tasks start at different offsets.
    */
  def routeUniform(
      df: DataFrame,
      cfg: BucketPriorityConfig,
      numPartitions: Int,
      keyCol: Column
  ): DataFrame = {
    val ranges = BucketLayout.ranges(cfg, numPartitions)
    val bucket = bucketOf(keyCol, cfg)
    val withBucket = df.withColumn("bucket", bucket)
    val start = bucketCase(col("bucket"), ranges.map { case (n, (s, _)) => (n, s) })
    val size = bucketCase(col("bucket"), ranges.map { case (n, (_, z)) => (n, z) })
    // Per-task dense counter: monotonically_increasing_id is (taskPartition
    // << 33) + row-in-task, so (id & mask) is dense within a task; adding
    // spark_partition_id() staggers task starting offsets across the range.
    val perTask = monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    withBucket.withColumn(
      "pt",
      when(col("bucket").isNull, lit(null).cast("int"))
        .when(size === 0, lit(-1))
        .otherwise(start + ((perTask + spark_partition_id()) % size).cast("int")))
  }

  /** `discard` fallback: keep only routable rows (documented intent of
    * DiscardPartitioner.java:15-18 — unroutable messages are never written). */
  def discard(df: DataFrame): DataFrame =
    df.filter(col("pt").isNotNull && col("pt") =!= -1)
}

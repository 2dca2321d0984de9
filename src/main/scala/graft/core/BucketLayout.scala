package graft.core

/** Deterministic partition layout: which partitions does each bucket own?
  *
  * This is the single source of truth the reference duplicates verbatim in two
  * files (BucketPriorityPartitioner.java:96-154 and
  * BucketPriorityAssignor.java:151-209). Normative algorithm, in order:
  *
  *  1. buckets ordered DESCENDING by allocation (done once in
  *     [[BucketPriorityConfig]]);
  *  2. provisional size per bucket = `Math.round(alloc / 100f * n)` — half-up
  *     FLOAT rounding (Bucket.java:46-48). Must stay `Float`: SQL ROUND or
  *     Double rounding diverge on edge allocations;
  *  3. if `n - Σsizes > 0`, hand out the remaining partitions one at a time,
  *     round-robin over buckets in descending-allocation order
  *     (BucketPriorityPartitioner.java:124-139);
  *  4. assign partition ids contiguously ascending from 0 in bucket order,
  *     stopping once partition `n-1` is placed
  *     (BucketPriorityPartitioner.java:141-153). Over-allocation consequence:
  *     Σround may exceed n, so trailing (lowest-priority) buckets may own ZERO
  *     partitions — e.g. 55/40/5 over 10 → 6+4+1=11 → [0..5], [6..9], ∅
  *     (asserted by BucketPriorityPartitionerTest.java:186-262).
  */
object BucketLayout {

  final case class InvalidLayoutException(msg: String) extends IllegalArgumentException(msg)

  /** @return (bucketName, owned partition ids) in descending-allocation order;
    *         ranges are contiguous, ascending, disjoint, and cover a prefix of
    *         `0 until numPartitions` (they cover all of it because step 3 only
    *         stops when every partition is placed).
    * @throws InvalidLayoutException when `numPartitions < cfg.numBuckets`
    *         (reference: BucketPriorityPartitioner.java:98-105)
    */
  def layout(cfg: BucketPriorityConfig, numPartitions: Int): Seq[(String, Seq[Int])] = {
    // topic-aware entry: throw with the reference's VERBATIM wording
    // (BucketPriorityPartitioner.java:99-104 — spec-pinned, r8 parity
    // insurance); the name-agnostic overload below keeps its own message
    // because it has no topic to interpolate
    if (numPartitions < cfg.numBuckets)
      throw InvalidLayoutException(referenceIncompatibleMessage(cfg.topic, cfg.numBuckets))
    layout(cfg.buckets.zip(cfg.allocation), numPartitions)
  }

  /** The reference's exact partitions-vs-buckets error text
    * (BucketPriorityPartitioner.java:99-104). */
  def referenceIncompatibleMessage(topic: String, numBuckets: Int): String =
    s"The number of partitions available for the topic '$topic' is incompatible " +
      s"with the number of buckets. It needs to be at least $numBuckets."

  /** `bucketsDescending` must already be ordered descending by allocation. */
  def layout(bucketsDescending: Seq[(String, Int)], numPartitions: Int): Seq[(String, Seq[Int])] = {
    val k = bucketsDescending.size
    if (numPartitions < k)
      throw InvalidLayoutException(
        s"The number of partitions available ($numPartitions) is incompatible with the " +
          s"number of buckets ($k): need at least one partition per bucket")

    // step 2: half-up float rounding, per-bucket provisional size
    val sizes: Array[Int] =
      bucketsDescending.map { case (_, alloc) => math.round(alloc / 100f * numPartitions) }.toArray

    // step 3: distribute any leftover round-robin in priority order
    var remaining = numPartitions - sizes.sum
    var i = 0
    while (remaining > 0) {
      sizes(i % k) += 1
      i += 1
      remaining -= 1
    }

    // step 4: contiguous ascending assignment, truncated at numPartitions
    var next = 0
    bucketsDescending.zipWithIndex.map { case ((name, _), j) =>
      val take = math.max(0, math.min(sizes(j), numPartitions - next))
      val owned = next until (next + take)
      next += take
      (name, owned: Seq[Int])
    }
  }

  /** Layout as (bucket → (firstPartition, size)); size 0 ⇒ empty bucket. */
  def ranges(cfg: BucketPriorityConfig, numPartitions: Int): Seq[(String, (Int, Int))] =
    layout(cfg, numPartitions).map { case (name, parts) =>
      (name, (parts.headOption.getOrElse(-1), parts.size))
    }

  /** Round-robin slot of counter value `c` within a bucket of `size`
    * partitions — the reference's `Utils.toPositive(nextValue) % size`
    * (Bucket.java:22-29, Kafka's `Utils.toPositive` = `i & 0x7fffffff`).
    * The mask (NOT a plain `%`, NOT `floorMod`) is what makes the counter
    * survive Int wraparound exactly like the reference: after 2³¹
    * increments in one task's bucket `c` goes negative, `c % size` would
    * step OUTSIDE the bucket's range, while `(c & 0x7fffffff) % size`
    * re-enters the cycle at the same slot the reference's producer would.
    * Implausible per-task volume — but at 100 TB "implausible per task" is
    * weaker than it sounds, and parity is one mask. */
  @inline def counterSlot(c: Int, size: Int): Int = (c & 0x7fffffff) % size
}

package graft.core

import scala.collection.mutable

/** Pure re-implementation of the reference's consumer-group assignment
  * (BucketPriorityAssignor.java:92-149) for parity testing.
  *
  * Spark has no consumer groups — Structured Streaming reads all partitions and
  * the driver schedules tasks — so this function is NOT runtime machinery here.
  * The operational equivalent is one streaming query per bucket over that
  * bucket's partitions with FAIR-pool weights ∝ allocation (see
  * [[graft.streaming.PriorityPools]]). This pure function exists so the
  * reference's assignment tests (BucketPriorityAssignorTest.java:114-343) have a
  * Scala counterpart.
  */
object BucketAssign {

  final case class TopicPartition(topic: String, partition: Int)

  /** What a consumer advertises on (re)join: its topics and, iff it subscribes
    * to the bucket topic, its declared bucket
    * (reference `subscriptionUserData`, BucketPriorityAssignor.java:78-89). */
  final case class Subscription(topics: Seq[String], bucket: Option[String])

  /** Assign partitions to consumers.
    *
    * Normative semantics (BucketPriorityAssignor.java:92-149):
    *  1. layout computed from the current partition count of the bucket topic;
    *  2. every consumer subscribed to the bucket topic gets an entry in the
    *     result, possibly empty (line 107) — consumers declaring an unknown
    *     bucket receive nothing;
    *  3. each bucket's partitions are dealt round-robin over that bucket's
    *     consumers using ONE counter shared across all buckets (lines 127-139):
    *     with k consumers and p partitions a consumer gets ⌈p/k⌉ or ⌊p/k⌋,
    *     contiguity not guaranteed;
    *  4. consumers of other topics are delegated wholesale to the fallback
    *     assignor (default RangeAssignor) and merged (lines 140-147);
    *  5. no sticky state: a rebalance is just a re-evaluation; a bucket with
    *     zero consumers simply has unconsumed partitions
    *     (BucketPriorityAssignorTest.java:294-342).
    *
    * Consumer iteration order within a bucket is the sorted consumer id order
    * (the reference iterates map order; tests assert invariants, not byte
    * order — SURVEY §5).
    */
  def assign(
      cfg: BucketPriorityConfig,
      partitionsPerTopic: Map[String, Int],
      subscriptions: Map[String, Subscription]
  ): Map[String, Seq[TopicPartition]] = {
    val result = mutable.LinkedHashMap.empty[String, mutable.Buffer[TopicPartition]]

    // -- bucket topic ------------------------------------------------------
    val bucketTopicConsumers = subscriptions.collect {
      case (cid, sub) if sub.topics.contains(cfg.topic) => cid -> sub
    }
    // every group member gets an entry, possibly empty — Kafka's
    // AbstractPartitionAssignor/RangeAssignor initialize all members even
    // when their topics have no metadata yet
    subscriptions.keys.toSeq.sorted.foreach { cid =>
      result(cid) = mutable.Buffer.empty
    }
    partitionsPerTopic.get(cfg.topic).foreach { n =>
      val lay = BucketLayout.layout(cfg, n)
      val byBucket: Map[String, Seq[String]] = bucketTopicConsumers.toSeq
        .collect { case (cid, sub) if sub.bucket.isDefined => (sub.bucket.get, cid) }
        .groupBy(_._1)
        .map { case (b, xs) => b -> xs.map(_._2).sorted }
      var count = 0 // the single shared counter (Assignor:127)
      lay.foreach { case (bucketName, parts) =>
        byBucket.get(bucketName).filter(_.nonEmpty).foreach { consumers =>
          parts.foreach { p =>
            result(consumers(count % consumers.size)) += TopicPartition(cfg.topic, p)
            count += 1
          }
        }
      }
    }

    // -- other topics: delegated wholesale to the configured fallback ------
    // The reference routes each consumer to EXACTLY ONE branch
    // (BucketPriorityAssignor.java:106-122): a bucket-topic subscriber is
    // never handed to the fallback, even for its other topics. Everyone else
    // goes to the configured fallback assignor in ONE call with the full
    // partition metadata, and the fallback's assignments are merged in
    // (BucketPriorityAssignor.java:140-147 — `fallback.assign(...)` +
    // `putAll`). The delegated consumers cannot touch cfg.topic's partitions:
    // by construction none of them subscribes to it.
    val otherSubscriptions = subscriptions.filter {
      case (_, sub) => !sub.topics.contains(cfg.topic)
    }
    if (otherSubscriptions.nonEmpty) {
      // instantiation was validated at configure time; a Left here means the
      // classpath changed under a live config — surface it loudly
      val fallback = cfg.newFallbackAssignor().fold(
        err => throw new IllegalStateException(err.message), identity)
      fallback.assign(partitionsPerTopic, otherSubscriptions).foreach {
        case (cid, tps) =>
          result.getOrElseUpdate(cid, mutable.Buffer.empty) ++= tps
      }
    }

    result.map { case (k, v) => k -> v.toSeq }.toMap
  }
}

package graft.core

/** Pluggable assignment strategy for consumers that do NOT subscribe to the
  * bucket topic.
  *
  * Mirrors the reference's `bucket.priority.fallback.assignor` surface: a
  * CLASS-type config (BucketPriorityConfig.java:36-38,54-56,82-88, default
  * RangeAssignor) whose instantiability is validated at configure time
  * (BucketPriorityAssignor.java:52-59 — an uninstantiable or wrong-typed
  * class is an InvalidConfigurationException before any assignment runs) and
  * which receives the other-topic subscriptions wholesale at assign time
  * (BucketPriorityAssignor.java:140-147).
  *
  * Implementations need a public no-arg constructor — instantiation goes
  * through reflection exactly like Kafka's `getConfiguredInstance`.
  */
trait FallbackAssignor {
  def assign(
      partitionsPerTopic: Map[String, Int],
      subscriptions: Map[String, BucketAssign.Subscription]
  ): Map[String, Seq[BucketAssign.TopicPartition]]
}

object FallbackAssignor {
  /** Default mirrors the reference's RangeAssignor default. */
  val DefaultClassName: String = classOf[RangeFallbackAssignor].getName

  /** Reflectively instantiate `className` as a [[FallbackAssignor]]. Any
    * failure — unknown class, wrong supertype, no-arg constructor missing or
    * throwing — is the reference's "The fallback assignor configured is
    * invalid" error, surfaced as a Left so configure-time validation and
    * assign-time instantiation share one code path. */
  def instantiate(className: String): Either[ConfigError, FallbackAssignor] =
    try {
      Class.forName(className).getDeclaredConstructor().newInstance() match {
        case fa: FallbackAssignor => Right(fa)
        case other => Left(ConfigError.InvalidFallbackAssignor(
          className, s"${other.getClass.getName} is not a FallbackAssignor"))
      }
    } catch {
      // LinkageError covers ExceptionInInitializerError / NoClassDefFoundError
      // — a static initializer that throws must surface as the config error,
      // not escape BucketPriorityConfig.apply's no-throw contract
      case e @ (_: ReflectiveOperationException | _: LinkageError |
                _: SecurityException) =>
        Left(ConfigError.InvalidFallbackAssignor(className, e.toString))
    }
}

/** Kafka RangeAssignor semantics (public contract of
  * o.a.k.clients.consumer.RangeAssignor, the reference's default fallback):
  * per topic, subscribers sorted by consumer id; each receives n/k contiguous
  * partitions and the first n%k consumers one extra. Every delegated consumer
  * gets an entry, possibly empty, matching AbstractPartitionAssignor's
  * initialization of all members. */
final class RangeFallbackAssignor extends FallbackAssignor {
  override def assign(
      partitionsPerTopic: Map[String, Int],
      subscriptions: Map[String, BucketAssign.Subscription]
  ): Map[String, Seq[BucketAssign.TopicPartition]] = {
    val result = scala.collection.mutable.LinkedHashMap.empty[
      String, scala.collection.mutable.Buffer[BucketAssign.TopicPartition]]
    subscriptions.keys.toSeq.sorted.foreach(cid =>
      result(cid) = scala.collection.mutable.Buffer.empty)
    partitionsPerTopic.toSeq.sortBy(_._1).foreach { case (topic, n) =>
      val consumers = subscriptions.collect {
        case (cid, sub) if sub.topics.contains(topic) => cid
      }.toSeq.sorted
      if (consumers.nonEmpty) {
        val base = n / consumers.size
        val extra = n % consumers.size
        var next = 0
        consumers.zipWithIndex.foreach { case (cid, idx) =>
          val take = base + (if (idx < extra) 1 else 0)
          (next until next + take).foreach(p =>
            result(cid) += BucketAssign.TopicPartition(topic, p))
          next += take
        }
      }
    }
    result.map { case (k, v) => k -> v.toSeq }.toMap
  }
}

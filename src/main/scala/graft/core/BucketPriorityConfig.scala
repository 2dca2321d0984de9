package graft.core

/** Validated bucket-priority configuration.
  *
  * Semantics mirror the reference's `configure()` validation surface
  * (reference: BucketPriorityConfig.java:10-90, BucketPriorityPartitioner.java:27-59,
  * BucketPriorityAssignor.java:34-75):
  *   - `topic`, `buckets`, `allocation` are mandatory;
  *   - allocation list must have the same length as the bucket list;
  *   - each allocation is an integer percentage, optionally suffixed `%`,
  *     surrounding whitespace ignored;
  *   - allocations must sum to exactly 100;
  *   - `delimiter` defaults to `"-"` and is a REGEX (it feeds String.split);
  *   - the consumer-side `bucket` declaration defaults to `""`;
  *   - `fallbackAssignor` names the [[FallbackAssignor]] class delegated the
  *     non-bucket-topic consumers (default [[RangeFallbackAssignor]]), and
  *     must be instantiable at configure time — reference
  *     BucketPriorityConfig.java:36-38,54-56,82-88 (CLASS config, default
  *     RangeAssignor) and BucketPriorityAssignor.java:52-59 (instantiation
  *     failure is an InvalidConfigurationException).
  *
  * Construction is only possible through [[BucketPriorityConfig.apply]] /
  * [[BucketPriorityConfig.fromRaw]], which return `Either` instead of throwing,
  * so invalid configs are unrepresentable downstream.
  *
  * @param buckets bucket names ordered descending by allocation (ties keep
  *                caller order), the order every layout/assignment consumes
  *                (reference: Bucket.java:31-40 inverted compareTo + LinkedHashMap
  *                sort at BucketPriorityPartitioner.java:49-58)
  */
final case class BucketPriorityConfig private (
    topic: String,
    buckets: Seq[String],
    allocation: Seq[Int],
    delimiter: String,
    consumerBucket: String,
    fallbackAssignor: String
) {
  /** allocation percent per bucket, in the descending order of `buckets`. */
  def allocationOf(bucket: String): Option[Int] =
    buckets.zip(allocation).collectFirst { case (b, a) if b == bucket => a }

  def numBuckets: Int = buckets.size

  /** Fresh fallback instance. Safe to `.toOption.get`-free: the class was
    * validated instantiable when this config was constructed, so a Left here
    * means the classpath changed underneath a live config. */
  def newFallbackAssignor(): Either[ConfigError, FallbackAssignor] =
    FallbackAssignor.instantiate(fallbackAssignor)
}

sealed abstract class ConfigError(val message: String) {
  /** The reference's VERBATIM error string for this failure, where the
    * reference has one (r8 parity insurance — spec-pinned against the
    * literal text so a wording drift is caught at build time):
    *   - allocation/bucket count mismatch: BucketPriorityPartitioner.java:35-37
    *   - allocation sum ≠ 100:             BucketPriorityPartitioner.java:40-42
    * Failures the reference does not validate (duplicate names, per-bucket
    * range, empty names — its UB territory, see the case notes) have no
    * reference wording and return None. */
  def referenceMessage: Option[String] = this match {
    case _: ConfigError.LengthMismatch => Some(
      "The bucket allocation doesn't match with the number of buckets configured.")
    case _: ConfigError.BadSum => Some(
      "The bucket allocation is incorrect. The sum of all buckets needs to be 100.")
    case _ => None
  }
}
object ConfigError {
  final case class MissingKey(key: String)
      extends ConfigError(s"Configuration key '$key' is mandatory and was not provided")
  final case class LengthMismatch(numBuckets: Int, numAllocations: Int)
      extends ConfigError(
        s"The number of buckets ($numBuckets) and the number of allocations " +
          s"($numAllocations) differ: every bucket needs exactly one allocation")
  final case class NotAPercentage(raw: String)
      extends ConfigError(s"Allocation '$raw' is not an integer percentage")
  final case class BadSum(sum: Int)
      extends ConfigError(s"Bucket allocations must sum to exactly 100, got $sum")
  final case class BadAllocation(value: Int)
      extends ConfigError(s"Each bucket allocation must be between 1 and 100, got $value")
  final case class DuplicateBucket(name: String)
      extends ConfigError(s"Bucket '$name' is declared more than once")
  // the reference trims names into its bucket map without rejecting "" —
  // but a key consisting entirely of delimiter matches splits to length 0
  // in Java (trailing empties dropped) and would never reach an ""-named
  // bucket anyway, while Spark's split keeps empties and WOULD. Rejecting
  // "" up front (reference-UB territory, like negative allocations) makes
  // bucket_of's outcome identical to String.split+containsKey on every key
  // — property-tested in BucketRoutingSpec.
  final case class EmptyBucketName()
      extends ConfigError("Bucket names must be non-empty after trimming")
  // reference wording: BucketPriorityAssignor.java:57-58
  final case class InvalidFallbackAssignor(className: String, cause: String)
      extends ConfigError(
        s"The fallback assignor configured is invalid: '$className' ($cause)")
}

object BucketPriorityConfig {
  val DefaultDelimiter = "-"

  /** Smart constructor over already-parsed allocations. */
  def apply(
      topic: String,
      buckets: Seq[String],
      allocation: Seq[Int],
      delimiter: String = DefaultDelimiter,
      consumerBucket: String = "",
      fallbackAssignor: String = FallbackAssignor.DefaultClassName
  ): Either[ConfigError, BucketPriorityConfig] = {
    // the reference trims bucket names at configure time
    // (BucketPriorityPartitioner.java:46, BucketPriorityAssignor.java:62) —
    // its own tests pass comma-separated lists like "B1, B2, B3"
    val trimmed = if (buckets == null) buckets else buckets.map(_.trim)
    if (topic == null || topic.isEmpty) Left(ConfigError.MissingKey("topic"))
    else if (trimmed == null || trimmed.isEmpty) Left(ConfigError.MissingKey("buckets"))
    else if (allocation == null || allocation.isEmpty) Left(ConfigError.MissingKey("allocation"))
    else if (trimmed.size != allocation.size)
      Left(ConfigError.LengthMismatch(trimmed.size, allocation.size))
    else if (trimmed.distinct.size != trimmed.size)
      Left(ConfigError.DuplicateBucket(
        trimmed.diff(trimmed.distinct).headOption.getOrElse(trimmed.head)))
    else if (trimmed.exists(_.isEmpty)) Left(ConfigError.EmptyBucketName())
    else if (allocation.exists(a => a < 1 || a > 100))
      // the reference only checks the sum (Partitioner:38-42); negative or
      // oversized per-bucket percentages would hit its undefined-behavior
      // territory (negative Math.round sizes), so reject them up front
      Left(ConfigError.BadAllocation(allocation.find(a => a < 1 || a > 100).get))
    else if (allocation.sum != 100) Left(ConfigError.BadSum(allocation.sum))
    else FallbackAssignor.instantiate(fallbackAssignor) match {
      // configure-time instantiation check, reference Assignor.java:52-59
      case Left(err) => Left(err)
      case Right(_) =>
        // Descending allocation, stable for ties (reference sorts once at
        // configure time: BucketPriorityPartitioner.java:49-58).
        val ordered = trimmed.zip(allocation).sortBy { case (_, a) => -a }
        Right(new BucketPriorityConfig(
          topic, ordered.map(_._1), ordered.map(_._2), delimiter, consumerBucket,
          fallbackAssignor))
    }
  }

  /** Raw-string constructor: allocations like `"70%"`, `" 30 "` — strip the
    * optional `%` and whitespace, then parse int
    * (reference: BucketPriorityPartitioner.java:30-33). */
  def fromRaw(
      topic: String,
      buckets: Seq[String],
      allocation: Seq[String],
      delimiter: String = DefaultDelimiter,
      consumerBucket: String = "",
      fallbackAssignor: String = FallbackAssignor.DefaultClassName
  ): Either[ConfigError, BucketPriorityConfig] = {
    val parsed = allocation.map { raw =>
      val cleaned = Option(raw).getOrElse("").replace("%", "").trim
      try Right(cleaned.toInt)
      catch { case _: NumberFormatException => Left(ConfigError.NotAPercentage(raw)) }
    }
    parsed.collectFirst { case Left(e) => e } match {
      case Some(e) => Left(e)
      case None    => apply(topic, buckets, parsed.map(_.toOption.get), delimiter,
        consumerBucket, fallbackAssignor)
    }
  }

  /** The delimiter is used as a regex by the reference (String.split).
    * Helper for callers that want to treat it literally. */
  def literalDelimiterRegex(delim: String): String = java.util.regex.Pattern.quote(delim)
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Parity with the reference's config-validation tests
  * (BucketPriorityPartitionerTest.java:28-107, BucketPriorityAssignorTest.java:24-111). */
class BucketConfigSpec extends AnyFunSuite {

  test("missing topic / buckets / allocation are errors") {
    assert(BucketPriorityConfig("", Seq("B1"), Seq(100)).isLeft)
    assert(BucketPriorityConfig("t", Seq(), Seq()).isLeft)
    assert(BucketPriorityConfig("t", Seq("B1"), Seq()).isLeft)
  }

  test("bucket/allocation length mismatch is an error") {
    val r = BucketPriorityConfig("t", Seq("B1", "B2"), Seq(100))
    assert(r == Left(ConfigError.LengthMismatch(2, 1)))
  }

  test("allocations must sum to exactly 100") {
    assert(BucketPriorityConfig("t", Seq("B1", "B2"), Seq(70, 20)) ==
      Left(ConfigError.BadSum(90)))
    assert(BucketPriorityConfig("t", Seq("B1", "B2"), Seq(70, 40)) ==
      Left(ConfigError.BadSum(110)))
    assert(BucketPriorityConfig("t", Seq("B1", "B2"), Seq(70, 30)).isRight)
  }

  test("raw percent strings: strip % and whitespace (Partitioner:30-33)") {
    val r = BucketPriorityConfig.fromRaw("t", Seq("B1", "B2"), Seq(" 70% ", "30"))
    assert(r.isRight)
    assert(r.toOption.get.allocation == Seq(70, 30))
    assert(BucketPriorityConfig.fromRaw("t", Seq("B1"), Seq("all")) ==
      Left(ConfigError.NotAPercentage("all")))
  }

  test("buckets ordered descending by allocation, stable ties") {
    val r = BucketPriorityConfig("t", Seq("low", "high", "mid"), Seq(20, 50, 30)).toOption.get
    assert(r.buckets == Seq("high", "mid", "low"))
    assert(r.allocation == Seq(50, 30, 20))
    val ties = BucketPriorityConfig("t", Seq("a", "b", "c", "d"), Seq(25, 25, 25, 25)).toOption.get
    assert(ties.buckets == Seq("a", "b", "c", "d")) // stable
  }

  test("defaults: delimiter '-', consumer bucket ''") {
    val r = BucketPriorityConfig("t", Seq("B1"), Seq(100)).toOption.get
    assert(r.delimiter == "-")
    assert(r.consumerBucket == "")
  }

  test("duplicate bucket names rejected") {
    assert(BucketPriorityConfig("t", Seq("B1", "B1"), Seq(50, 50)).isLeft)
  }
}

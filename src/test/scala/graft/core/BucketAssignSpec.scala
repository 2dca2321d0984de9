package graft.core

import org.scalatest.funsuite.AnyFunSuite
import BucketAssign.{Subscription, TopicPartition}

/** All-to-one test fallback: proves BucketAssign delegates to the CONFIGURED
  * class, not to hard-coded range semantics. Top-level with a no-arg
  * constructor so reflective instantiation works. */
class GrabAllFallbackAssignor extends FallbackAssignor {
  override def assign(
      partitionsPerTopic: Map[String, Int],
      subscriptions: Map[String, Subscription]
  ): Map[String, Seq[TopicPartition]] = {
    val first = subscriptions.keys.toSeq.sorted.head
    subscriptions.keys.map { cid =>
      cid -> (if (cid == first)
        partitionsPerTopic.toSeq.sortBy(_._1).flatMap { case (t, n) =>
          if (subscriptions.values.exists(_.topics.contains(t)))
            (0 until n).map(TopicPartition(t, _))
          else Seq.empty
        }
      else Seq.empty[TopicPartition])
    }.toMap
  }
}

/** Static-init failure fixture for the configure-time validation test. */
class ExplodingInitAssignor extends FallbackAssignor {
  ExplodingInitAssignor.boom()
  override def assign(
      partitionsPerTopic: Map[String, Int],
      subscriptions: Map[String, Subscription]
  ): Map[String, Seq[TopicPartition]] = Map.empty
}
object ExplodingInitAssignor {
  def boom(): Unit = throw new RuntimeException("constructor failure fixture")
}

/** Parity with the reference assignor tests (BucketPriorityAssignorTest.java). */
class BucketAssignSpec extends AnyFunSuite {

  private val c8020 =
    BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20)).toOption.get

  test("8 B1 + 2 B2 consumers over 80/20 x 10 (AssignorTest:155-223)") {
    val subs =
      (0 until 8).map(i => f"c$i%02d" -> Subscription(Seq("orders"), Some("B1"))).toMap ++
        (8 until 10).map(i => f"c$i%02d" -> Subscription(Seq("orders"), Some("B2"))).toMap
    val r = BucketAssign.assign(c8020, Map("orders" -> 10), subs)
    assert(r.keySet == subs.keySet) // every subscriber present
    // B1 consumers own only partitions 0-7; B2 consumers only 8-9; all non-empty
    (0 until 8).foreach { i =>
      val ps = r(f"c$i%02d").map(_.partition)
      assert(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 7))
    }
    (8 until 10).foreach { i =>
      val ps = r(f"c$i%02d").map(_.partition)
      assert(ps.nonEmpty && ps.forall(p => p >= 8 && p <= 9))
    }
    // complete, disjoint
    assert(r.values.flatten.map(_.partition).toSeq.sorted == (0 until 10))
  }

  test("rebalance: B2 consumers gone -> B2 partitions unassigned (AssignorTest:226-343)") {
    val subs = (0 until 6).map(i => s"c$i" -> Subscription(Seq("orders"), Some("B1"))).toMap
    val r = BucketAssign.assign(c8020, Map("orders" -> 10), subs)
    assert(r.keySet == subs.keySet)
    val assigned = r.values.flatten.map(_.partition).toSeq.sorted
    assert(assigned == (0 until 8)) // only B1's partitions; 8,9 unconsumed
    // fairness: ceil/floor split of 8 partitions over 6 consumers
    assert(r.values.map(_.size).toSeq.sorted == Seq(1, 1, 1, 1, 2, 2))
  }

  test("multi-topic: non-bucket topic delegated to range fallback (AssignorTest:114-152)") {
    val subs = Map(
      "b0" -> Subscription(Seq("orders"), Some("B1")),
      "b1" -> Subscription(Seq("orders"), Some("B2")),
      "r0" -> Subscription(Seq("plain"), None),
      "r1" -> Subscription(Seq("plain"), None))
    val r = BucketAssign.assign(c8020, Map("orders" -> 6, "plain" -> 6), subs)
    assert(r.keySet == Set("b0", "b1", "r0", "r1"))
    assert(r.values.forall(_.nonEmpty))
    // range fallback: contiguous halves of "plain"
    assert(r("r0").map(_.partition).sorted == Seq(0, 1, 2))
    assert(r("r1").map(_.partition).sorted == Seq(3, 4, 5))
    assert(r("r0").forall(_.topic == "plain"))
    // bucket topic: 80/20 over 6 -> B1=[0-4], B2=[5]
    assert(r("b0").map(_.partition).sorted == Seq(0, 1, 2, 3, 4))
    assert(r("b1").map(_.partition).sorted == Seq(5))
  }

  test("unknown bucket declaration gets an entry but no partitions (Assignor:104-124)") {
    val subs = Map(
      "good" -> Subscription(Seq("orders"), Some("B1")),
      "weird" -> Subscription(Seq("orders"), Some("NoSuchBucket")))
    val r = BucketAssign.assign(c8020, Map("orders" -> 10), subs)
    assert(r("weird").isEmpty)
    assert(r("good").map(_.partition).sorted == (0 until 8))
  }

  test("mixed subscription: a bucket-topic consumer is NOT handed to the fallback (Assignor:106-122)") {
    val subs = Map(
      "c1" -> Subscription(Seq("orders", "misc"), Some("B1")), // bucket consumer, also subscribes misc
      "c2" -> Subscription(Seq("misc"), None))
    val r = BucketAssign.assign(c8020, Map("orders" -> 10, "misc" -> 4), subs)
    // reference: each consumer goes to exactly one branch — c1 gets only
    // bucket-topic partitions, c2 gets ALL of misc via the fallback
    assert(r("c1").forall(_.topic == "orders"))
    assert(r("c2").map(_.partition).sorted == Seq(0, 1, 2, 3))
    assert(r("c2").forall(_.topic == "misc"))
  }

  test("invalid fallback assignor class fails at configure time (AssignorTest:93-111)") {
    // the reference passes its own TEST class — present on the classpath but
    // not an assignor — and expects InvalidConfigurationException
    val notAnAssignor = BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20),
      fallbackAssignor = classOf[BucketAssignSpec].getName)
    assert(notAnAssignor.swap.toOption.exists(
      _.isInstanceOf[ConfigError.InvalidFallbackAssignor]))
    val noSuchClass = BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20),
      fallbackAssignor = "graft.core.DoesNotExist")
    assert(noSuchClass.swap.toOption.exists(
      _.isInstanceOf[ConfigError.InvalidFallbackAssignor]))
    assert(noSuchClass.swap.toOption.get.message.contains(
      "The fallback assignor configured is invalid"))
    // a static initializer that throws must surface as the config error too
    // (ExceptionInInitializerError is an Error, not an Exception)
    val initThrows = BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20),
      fallbackAssignor = classOf[ExplodingInitAssignor].getName)
    assert(initThrows.swap.toOption.exists(
      _.isInstanceOf[ConfigError.InvalidFallbackAssignor]))
  }

  test("default fallback is range semantics; configured class is what runs") {
    assert(c8020.fallbackAssignor == FallbackAssignor.DefaultClassName)
    // same topology as the multi-topic test, but with the all-to-one fallback:
    // the delegated consumers' split must change while bucket assignment and
    // the one-branch-per-consumer rule stay intact
    val cfg = BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20),
      fallbackAssignor = classOf[GrabAllFallbackAssignor].getName).toOption.get
    val subs = Map(
      "b0" -> Subscription(Seq("orders"), Some("B1")),
      "r0" -> Subscription(Seq("plain"), None),
      "r1" -> Subscription(Seq("plain"), None))
    val r = BucketAssign.assign(cfg, Map("orders" -> 6, "plain" -> 6), subs)
    assert(r("r0").map(_.partition).sorted == Seq(0, 1, 2, 3, 4, 5)) // all-to-one
    assert(r("r0").forall(_.topic == "plain")) // never touches the bucket topic
    assert(r("r1").isEmpty)
    assert(r("b0").map(_.partition).sorted == Seq(0, 1, 2, 3, 4))
  }

  test("every subscriber gets an entry even when its topic has no metadata yet") {
    val subs = Map("lonely" -> Subscription(Seq("not-yet-created"), None))
    val r = BucketAssign.assign(c8020, Map("orders" -> 10), subs)
    assert(r.contains("lonely") && r("lonely").isEmpty)
  }

  test("bucket names are trimmed at config time (reference configure(), Partitioner:46)") {
    val cfg = graft.core.BucketPriorityConfig("t", Seq("B1", " B2", " B3"), Seq(50, 30, 20)).toOption.get
    assert(cfg.buckets.toSet == Set("B1", "B2", "B3"))
  }

  test("every assigned partition belongs to the consumer's declared bucket") {
    val cfg = BucketPriorityConfig("t", Seq("a", "b", "c"), Seq(50, 30, 20)).toOption.get
    val subs = Map(
      "x" -> Subscription(Seq("t"), Some("a")),
      "y" -> Subscription(Seq("t"), Some("b")),
      "z" -> Subscription(Seq("t"), Some("c")))
    val lay = BucketLayout.layout(cfg, 12).toMap
    val r = BucketAssign.assign(cfg, Map("t" -> 12), subs)
    assert(r("x").map(_.partition).toSet == lay("a").toSet)
    assert(r("y").map(_.partition).toSet == lay("b").toSet)
    assert(r("z").map(_.partition).toSet == lay("c").toSet)
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.core.{BucketAssign, BucketLayout, BucketPriorityConfig}
import graft.streaming.PriorityStreams._

/** End-to-end producer→broker→consumer journey from the reference quickstart
  * (README.md:30-112): topic `orders`, buckets Platinum 70% / Gold 30%, six
  * partitions, a consumer group with two Platinum consumers and one Gold.
  *
  * No broker exists in this sandbox (and `/opt/spark/jars` ships no Kafka
  * connector), so the broker is simulated faithfully by its contract: a
  * topic is (partition → ordered records), a producer writes the kafka
  * frame's explicit `partition` column, and each consumer reads exactly the
  * partitions [[BucketAssign.assign]] hands it — the same three interfaces
  * the reference's partitioner/assignor pair plugs into. What this pins is
  * the INTEGRATION invariant the two halves only guarantee together: the
  * producer-side routing ([[PriorityStreams.routeStream]] →
  * [[PriorityStreams.toKafkaFrame]]) and the consumer-side assignment agree
  * on the same [[BucketLayout]], so a consumer declaring bucket b observes
  * records of bucket b, all of them, and nothing else.
  */
class PriorityPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg =
    BucketPriorityConfig("orders", Seq("Platinum", "Gold"), Seq(70, 30)).toOption.get
  private val numPartitions = 6

  test("quickstart journey: routeStream -> kafka frame -> per-bucket assign -> consumers") {
    implicit val sql = spark.sqlContext

    // ---- producer side: stream of keyed orders through the partitioner ----
    val in = MemoryStream[(String, String)]
    val routed = routeStream(
      in.toDF().toDF("key", "value"), cfg, numPartitions, col("key"))
    val frame = toKafkaFrame(routed, col("key"), col("value"))
    in.addData(
      (1 to 70).map(i => (f"Platinum-$i%03d", s"order-p$i")) ++
      (1 to 30).map(i => (f"Gold-$i%03d", s"order-g$i")) ++
      Seq(("Silver-001", "order-s1"))) // bucket not configured → unroutable
    val q = frame.writeStream.format("memory").queryName("orders_topic")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // ---- broker: the topic is just (partition -> records) ----
    val topic: Seq[(Option[Int], String, String)] =
      spark.table("orders_topic")
        .select(col("partition"), col("key").cast("string"), col("value").cast("string"))
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getString(1), r.getString(2)))
        .toSeq
    assert(topic.size == 101)
    // unroutable key → null partition (engine-default placement), never -1
    assert(topic.collect { case (None, k, _) => k } == Seq("Silver-001"))

    // ---- consumer group: 2 Platinum + 1 Gold, one assignment evaluation ----
    val subs = Map(
      "consumer-p1" -> BucketAssign.Subscription(Seq("orders"), Some("Platinum")),
      "consumer-p2" -> BucketAssign.Subscription(Seq("orders"), Some("Platinum")),
      "consumer-g1" -> BucketAssign.Subscription(Seq("orders"), Some("Gold")))
    val assignment =
      BucketAssign.assign(cfg, Map("orders" -> numPartitions), subs)

    // the assignor's ranges are the SAME layout the producer routed with
    val layout = BucketLayout.layout(cfg, numPartitions).toMap
    def assignedTo(bucket: String): Set[Int] = subs.collect {
      case (cid, s) if s.bucket.contains(bucket) => assignment(cid).map(_.partition)
    }.flatten.toSet
    assert(assignedTo("Platinum") == layout("Platinum").toSet)
    assert(assignedTo("Gold") == layout("Gold").toSet)
    // disjoint within the group, covering every partition of the topic
    val all = subs.keys.toSeq.flatMap(cid => assignment(cid).map(_.partition))
    assert(all.distinct.size == all.size && all.toSet == (0 until numPartitions).toSet)

    // ---- consumers: each reads exactly its assigned partitions ----
    val consumed = subs.keys.toSeq.sorted.flatMap { cid =>
      val mine = assignment(cid).map(_.partition).toSet
      topic.collect { case (Some(p), k, v) if mine(p) => (cid, k, v) }
    }
    // isolation: every record a consumer sees is of its declared bucket
    consumed.foreach { case (cid, key, _) =>
      assert(subs(cid).bucket.contains(key.split("-")(0)),
        s"$cid (bucket ${subs(cid).bucket}) consumed foreign key $key")
    }
    // completeness: every routable record is consumed exactly once
    assert(consumed.map(_._2).sorted ==
      topic.collect { case (Some(_), k, _) => k }.sorted)
    // both Platinum consumers actually share the load (round-robin dealt)
    val perConsumer = consumed.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perConsumer.keySet == subs.keySet, s"idle consumer: $perConsumer")
  }

  test("rebalance: Gold consumer leaves, its partitions go unconsumed (no spillover)") {
    // reference semantics: no sticky state, a bucket with zero consumers
    // simply has unconsumed partitions (BucketPriorityAssignorTest.java:294-342)
    val subs = Map(
      "consumer-p1" -> BucketAssign.Subscription(Seq("orders"), Some("Platinum")))
    val assignment = BucketAssign.assign(cfg, Map("orders" -> numPartitions), subs)
    val layout = BucketLayout.layout(cfg, numPartitions).toMap
    assert(assignment("consumer-p1").map(_.partition).toSet == layout("Platinum").toSet)
    // Gold's range is assigned to nobody — backlog accrues, priority holds
    val assignedAnywhere = assignment.values.flatten.map(_.partition).toSet
    assert(layout("Gold").toSet.intersect(assignedAnywhere).isEmpty)
  }
}

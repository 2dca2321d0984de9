package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.BucketPriorityConfig

/** The custom-operator router ([[graft.plans.AssignPartitionsExec]]) must be
  * row-for-row identical to the mapPartitions `routeUniform` — same inputs,
  * same partitioning, same per-(task, bucket) counters ⇒ same pt per row —
  * and actually planned by [[graft.plans.GraftStrategy]]. */
class AssignPartitionsSpec extends SparkTestBase {
  import spark.implicits._

  private val c8020 =
    BucketPriorityConfig("orders", Seq("B1", "B2"), Seq(80, 20)).toOption.get

  private def msgs = (0 until 64).flatMap { i =>
    Seq((s"B1-$i", i.toLong), (s"B2-$i", i.toLong),
      (s"Nope-$i", i.toLong), (null.asInstanceOf[String], i.toLong))
  }.toDF("key", "seq").repartition(4, col("seq"))

  test("native exec is planned and row-identical to the mapPartitions router") {
    val native = BucketRouting.routeUniformNative(msgs, c8020, 10, col("key"))
    // physical rendering strips the Exec suffix (like ProjectExec→Project),
    // so check the node type, not the string
    val hasExec = native.queryExecution.executedPlan.collect {
      case e: graft.plans.AssignPartitionsExec => e
    }.nonEmpty || native.queryExecution.executedPlan.toString.contains("AssignPartitions")
    assert(hasExec, native.queryExecution.executedPlan.toString)
    val a = native.select("key", "seq", "bucket", "pt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getInt(3))).sortBy(x => (String.valueOf(x._1), x._2))
    val b = BucketRouting.routeUniform(msgs, c8020, 10, col("key"))
      .select("key", "seq", "bucket", "pt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getInt(3))).sortBy(x => (String.valueOf(x._1), x._2))
    assert(a.length == 256)
    assert(a.toSeq == b.toSeq)
  }

  test("native exec: -1 for empty buckets, null for unroutable, range bounds") {
    val cfg = BucketPriorityConfig("t", Seq("B1", "B2", "B3"), Seq(55, 40, 5)).toOption.get
    val routed = BucketRouting.routeUniformNative(
      (0 until 30).map(i => s"B3-$i").toDF("key"), cfg, 10, col("key"))
    // 55/40/5 over 10 over-allocates: B3 gets zero partitions -> all -1
    assert(routed.filter(col("pt") === -1).count() == 30)
    assert(BucketRouting.discard(routed).count() == 0)
    val ranged = BucketRouting.routeUniformNative(
      (0 until 40).map(i => s"B1-$i").toDF("key"), cfg, 10, col("key"))
    val pts = ranged.select("pt").as[Int].collect()
    assert(pts.forall(p => p >= 0 && p <= 5), pts.toSeq.toString) // B1 = [0..5]
  }

  test("native exec keeps <=1 skew per partition within each bucket per task") {
    val one = (0 until 80).map(i => s"B1-$i").toDF("key").repartition(1)
    val routed = BucketRouting.routeUniformNative(one, c8020, 10, col("key"))
    val counts = routed.groupBy("pt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // single task, 80 rows over B1's 8 partitions -> exactly 10 each
    assert(counts.keySet == (0 to 7).toSet)
    assert(counts.values.forall(_ == 10), counts.toString)
  }
}

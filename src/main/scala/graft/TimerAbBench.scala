package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Dev A/B for the lifecycle timer path (r12, verdict item 6): the r11
  * StreamBench leg ran 139-162k ev/s — 3-4x below the sibling stateful
  * legs — and the suspect was timer-registry churn: `handleInputRows`
  * range-scanned `listTimers()` and re-armed EVERY batch for EVERY key.
  * This main runs the exact StreamBench lifecycle-timer workload (2M
  * user-week observations, 1M RocksDB keys, 1M event-time timers that must
  * fire) through both processor variants — `listTimers` re-arm vs the
  * r12 targeted path (previous deadline DERIVED from prior state; delete +
  * re-arm only when it changes) — with the leg's full exactness asserts on
  * both. Prints one JSON line. Usage: sbt "runMain graft.TimerAbBench"
  */
object TimerAbBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-timer-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.PriorityStreams

    val LtUsers = 1_000_000L
    val LtW0 = 20006L
    val ltEvents = 2L * LtUsers
    val daySecs = 86400L

    def leg(targeted: Boolean): Double = {
      val srcDir = java.nio.file.Files.createTempDirectory(
        s"graft-tab-src-$targeted").toString
      spark.range(ltEvents).select(
        pmod(col("id"), lit(LtUsers)).as("userId"),
        (lit(LtW0) + when(col("id") < LtUsers, 0L).otherwise(7L)).as("weekDay"))
        .withColumn("ts", timestamp_seconds(col("weekDay") * daySecs))
        .repartition(6, col("userId"))
        .write.mode("overwrite").parquet(srcDir)
      def appendSentinel(): Unit =
        Seq((-1L, LtW0 + 70L)).toDF("userId", "weekDay")
          .withColumn("ts", timestamp_seconds(col("weekDay") * daySecs))
          .coalesce(1).write.mode("append").parquet(srcDir)
      val ckpt = java.nio.file.Files.createTempDirectory(
        s"graft-tab-ckpt-$targeted").toString
      val counts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      def runOnce(): Unit = {
        val weeks = spark.readStream
          .schema("userId BIGINT, weekDay BIGINT, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "2")
          .parquet(srcDir)
          .withWatermark("ts", "8 days")
          .as[PriorityStreams.TimedWeekEvent]
        val q = PriorityStreams.lifecycleTimerStream(weeks, targeted)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[PriorityStreams.LifecycleRow], bid: Long) =>
            if (seen.add(bid))
              b.filter(col("userId") =!= -1L).groupBy("state").count().collect()
                .foreach(r => counts.merge(r.getString(0), r.getLong(1), (a, x) => a + x))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        seen.clear() // batch ids restart per query on one checkpoint lineage
      }
      val t0 = System.nanoTime()
      runOnce()
      appendSentinel(); runOnce()
      appendSentinel(); runOnce()
      val secs = (System.nanoTime() - t0) / 1e9
      def c(s: String): Long = Option(counts.get(s)).map(_.longValue).getOrElse(0L)
      assert(c("new") == LtUsers, s"[$targeted] new ${c("new")}")
      assert(c("retained") == LtUsers, s"[$targeted] retained ${c("retained")}")
      assert(c("churned") == LtUsers, s"[$targeted] churned ${c("churned")} (1M timers must fire)")
      assert(c("resurrected") == 0L, s"[$targeted] resurrected ${c("resurrected")}")
      secs
    }

    val listScan = leg(targeted = false)
    val targeted = leg(targeted = true)
    println(f"""{"metric":"timer_ab","events":$ltEvents,"list_scan_secs":$listScan%.1f,"targeted_secs":$targeted%.1f,"list_scan_rps":${(ltEvents / listScan).toLong},"targeted_rps":${(ltEvents / targeted).toLong}}""")
    spark.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.core.BucketPriorityConfig
import graft.streaming.PriorityStreams._

class PriorityStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg =
    BucketPriorityConfig("events", Seq("purchase", "signup"), Seq(70, 30)).toOption.get

  private def ts(s: String) = Timestamp.valueOf(s)

  test("micro-batch routing: MemoryStream -> routeStream -> memory sink") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val routed = routeStream(
      in.toDF().toDF("key", "event_id"), cfg, 10, col("key"), discardUnroutable = true)
    in.addData((1 to 20).map(i => (s"purchase-$i", i.toLong)) ++
      (1 to 10).map(i => (s"signup-$i", i.toLong)) ++
      Seq(("view-1", 99L), ("garbage", 98L)))
    val q = routed.writeStream.format("memory").queryName("routed_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("routed_out")
    assert(out.count() == 30) // view/garbage discarded
    // purchase → [0..6] (70% of 10), signup → [7..9]
    assert(out.filter($"bucket" === "purchase").select("pt").as[Int].collect().forall(p => p >= 0 && p <= 6))
    assert(out.filter($"bucket" === "signup").select("pt").as[Int].collect().forall(p => p >= 7 && p <= 9))
  }

  test("kafka frame shape: key/value binary + int partition; -1 and null become engine placement") {
    val df = Seq(
      ("purchase-1", "payload", 1L), // routable
      ("view-9", "payload", 2L)      // unroutable → null partition
    ).toDF("key", "value", "event_id")
    val routed = routeStream(df, cfg, 10, col("key"))
    val kf = toKafkaFrame(routed, col("key"), col("value"))
    assert(kf.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "binary"), ("value", "binary"), ("partition", "integer")))
    val parts = kf.select("partition").collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(parts.count(_.isDefined) == 1 && parts.count(_.isEmpty) == 1)
    assert(parts.flatten.forall(p => p >= 0 && p <= 6)) // never -1 into the producer
  }

  test("tumbling window agg with watermark drops late rows in append mode") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val agg = bucketWindowAgg(
      in.toDF().toDF("key", "ts", "value"), cfg, col("key"), "ts",
      windowDur = "10 minutes", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    in.addData(
      ("purchase-1", ts("2024-01-01 00:01:00"), 1.0),
      ("purchase-2", ts("2024-01-01 00:05:00"), 2.0))
    q.processAllAvailable()
    // advance watermark far past the first window
    in.addData(("purchase-3", ts("2024-01-01 01:00:00"), 4.0))
    q.processAllAvailable()
    // late row for the long-closed 00:00 window: must be dropped
    in.addData(("purchase-4", ts("2024-01-01 00:02:00"), 100.0))
    q.processAllAvailable()
    // one more advance so anything incorrectly accepted would emit
    in.addData(("purchase-5", ts("2024-01-01 02:00:00"), 8.0))
    q.processAllAvailable(); q.stop()
    // closed first window emitted with only the 2 on-time rows
    assert(spark.table("win_out").filter($"w_start" === ts("2024-01-01 00:00:00"))
      .select("n").as[Long].collect().toSeq == Seq(2L))
  }

  test("update mode: windowed agg re-emits growing counts per batch") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val agg = bucketWindowAgg(
      in.toDF().toDF("key", "ts", "value"), cfg, col("key"), "ts",
      windowDur = "10 minutes", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("upd_out")
      .outputMode("update").start()
    in.addData(("purchase-1", ts("2024-01-01 00:01:00"), 1.0))
    q.processAllAvailable()
    in.addData(("purchase-2", ts("2024-01-01 00:02:00"), 2.0))
    q.processAllAvailable(); q.stop()
    // update mode emits the window's row once per batch it changed in: n=1 then n=2
    val ns = spark.table("upd_out").select("n").as[Long].collect().sorted.toSeq
    assert(ns == Seq(1L, 2L))
  }

  test("session windows: 2 sessions for a user with a >gap pause") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:03:00")),
      (1L, ts("2024-01-01 00:20:00")), // > 5 min gap → new session
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = sessionize(df, "ts", "user_id", gap = "5 minutes")
      .orderBy("user_id", "s_start")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val dd = dedupWithinWatermark(in.toDF().toDF("event_id", "ts"), "ts", Seq("event_id"))
    val q = dd.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:00:30")),
      (2L, ts("2024-01-01 00:01:00")))
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("backlog tracker accumulates per-bucket totals and max gap (batch mode)") {
    val events = Seq(
      BucketEvent("purchase", 1, 1000L),
      BucketEvent("purchase", 2, 5000L),
      BucketEvent("purchase", 3, 6000L),
      BucketEvent("signup", 4, 100L)).toDS()
    val out = backlogTracker(events).collect().map(b => b.bucket -> b).toMap
    assert(out("purchase").totalEvents == 3)
    assert(out("purchase").lastEventTsMicros == 6000L)
    assert(out("purchase").maxGapMicros == 4000L)
    assert(out("signup").totalEvents == 1)
  }

  test("foreachBatch: routing applied per micro-batch (the Kafka-sink deployment shape)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    in.addData((1 to 10).map(i => (s"purchase-$i", i.toLong)): _*)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val q = in.toDF().toDF("key", "event_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val routed = routeStream(batch, cfg, 10, col("key"), discardUnroutable = true)
        val kafkaFrame = toKafkaFrame(routed, col("key"), col("event_id").cast("string"))
        // stand-in for kafkaFrame.write.format("kafka"): collect (no broker here)
        collected ++= routed.select("bucket", "pt").collect()
          .map(r => (r.getString(0), r.getInt(1)))
        assert(kafkaFrame.columns.toSeq == Seq("key", "value", "partition"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(collected.size == 10)
    assert(collected.forall { case (b, p) => b == "purchase" && p >= 0 && p <= 6 })
  }

  test("rate source drives the routing pipeline (bench/load shape)") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "5000").load()
    val keyed = rate.withColumn("key",
      concat(when(col("value") % 2 === 0, "purchase").otherwise("signup"),
        lit("-"), col("value")))
    val routed = routeStream(keyed, cfg, 10, col("key"))
    val q = routed.writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    val deadline = System.currentTimeMillis() + 15000
    while (spark.table("rate_out").isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); q.processAllAvailable()
    }
    q.stop()
    val out = spark.table("rate_out")
    assert(out.count() > 0, "rate source produced no rows within 15s")
    assert(out.filter($"bucket" === "purchase").select("pt").as[Int].collect().forall(p => p >= 0 && p <= 6))
  }

  test("stream-stream join with event-time bounds joins only in-window pairs") {
    implicit val sql = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    views.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData(
      (1L, ts("2024-01-01 00:10:00")), // within 30min of the view → joins
      (2L, ts("2024-01-01 05:00:00"))) // 5h later → outside the bound
    val joined = correlateWithin(
      views.toDF().toDF("user_id", "view_ts"),
      buys.toDF().toDF("buy_user", "buy_ts"),
      leftKey = "user_id", rightKey = "buy_user",
      leftTs = "view_ts", rightTs = "buy_ts",
      within = "30 minutes", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj2_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssj2_out").select("user_id").as[Long].collect().toSeq
    assert(out == Seq(1L)) // only the in-window pair
  }

  test("left-outer correlateWithin emits unmatched left rows after the watermark closes their window") {
    implicit val sql = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = correlateWithin(
      views.toDF().toDF("user_id", "view_ts"),
      buys.toDF().toDF("buy_user", "buy_ts"),
      leftKey = "user_id", rightKey = "buy_user",
      leftTs = "view_ts", rightTs = "buy_ts",
      within = "30 minutes", watermark = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssjlo_out")
      .outputMode("append").start()
    views.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData((1L, ts("2024-01-01 00:10:00"))) // user 1 converts; user 2 never does
    q.processAllAvailable()
    // advance BOTH watermarks far past user 2's window so the joiner can
    // prove no partner can arrive, then emit the null-padded row
    views.addData((99L, ts("2024-01-01 03:00:00")))
    buys.addData((99L, ts("2024-01-01 09:00:00")))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssjlo_out")
      .select(col("user_id"), col("buy_user"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.toSet.contains((1L, Some(1L))), s"matched pair missing: ${out.toSeq}")
    assert(out.toSet.contains((2L, None)),
      s"unmatched left row not emitted after watermark: ${out.toSeq}")
  }

  test("stream-static join: stream enriched with a static dimension") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    in.addData((1L, "purchase"), (2L, "view"), (3L, "error"))
    val joined = in.toDF().toDF("user_id", "event_type")
      .join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssj_out").orderBy("user_id")
      .select("user_id", "tier").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
  }

  test("transformWithState backlog tracker agrees with flatMapGroupsWithState (streaming)") {
    implicit val sql = spark.sqlContext
    val events = Seq(
      BucketEvent("purchase", 1, 1000L),
      BucketEvent("purchase", 2, 5000L),
      BucketEvent("purchase", 3, 6000L),
      BucketEvent("signup", 4, 100L))
    val in = MemoryStream[BucketEvent]
    in.addData(events: _*)
    // transformWithState needs a multi-column-family store: RocksDB
    withRocksDB {
      val q = backlogTrackerTws(in.toDS()).writeStream
        .format("memory").queryName("tws_out").outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val tws = spark.table("tws_out").as[BucketBacklog]
      .collect().map(b => b.bucket -> b).toMap
    val fmgs = backlogTracker(events.toDS()).collect().map(b => b.bucket -> b).toMap
    assert(tws == fmgs)
    assert(tws("purchase").maxGapMicros == 4000L)
  }

  test("streaming funnel == batch funnel_steps on the same event-time-ordered input") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the real events table, event-time-ordered, split into two micro-batches
    // at the time midpoint — advancement must carry state across batches
    val evs = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .orderBy("ts")
      .as[(Long, String, Timestamp)].collect()
    val mid = evs(evs.length / 2)._3
    val in = MemoryStream[(Long, String, Timestamp)]
    withRocksDB {
      val q = funnelStream(
        in.toDF().toDF("userId", "eventType", "ts").as[FunnelEvent])
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    val advances = spark.table("funnel_out")
      .select("userId", "step").as[(Long, Int)].collect().toSet
    val streamCounts = (1 to 3).map(k => k -> advances.count(_._2 == k)).toMap
    val batch = graft.SparkEntry.queries("funnel_steps")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(streamCounts(1).toLong == batch("1_click"))
    assert(streamCounts(2).toLong == batch("2_signup"))
    assert(streamCounts(3).toLong == batch("3_purchase"))
  }

  test("funnel orders microsecond-spaced events like the batch twin (full ts precision)") {
    implicit val sql = spark.sqlContext
    // Three same-millisecond events, microseconds apart, arriving SHUFFLED:
    // click @ .000001, signup @ .000002, purchase @ .000003. A
    // milliseconds-truncating comparison (Timestamp.getTime) sees them as
    // simultaneous — the strict `ts > stepTs` check then rejects signup and
    // purchase and the funnel stalls at step 1; full-precision compareTo
    // (nanos field) must advance all three steps.
    def microTs(micro: Int): Timestamp = {
      val t = new Timestamp(1700000000000L) // fixed millisecond
      t.setNanos(micro * 1000)
      t
    }
    val events = Seq(
      FunnelEvent(7L, "purchase", microTs(3)),
      FunnelEvent(7L, "click", microTs(1)),
      FunnelEvent(7L, "signup", microTs(2)))
    val in = MemoryStream[FunnelEvent]
    withRocksDB {
      val q = funnelStream(in.toDS())
        .writeStream.format("memory").queryName("funnel_micro_out")
        .outputMode("update").start()
      in.addData(events)
      q.processAllAvailable(); q.stop()
    }
    val steps = spark.table("funnel_micro_out")
      .select("userId", "step").as[(Long, Int)].collect().toSet
    assert(steps == Set((7L, 1), (7L, 2), (7L, 3)),
      s"micro-spaced funnel advancements: $steps")
  }

  test("streaming SCD-2 upserts == batch scd2_intervals on the same ordered input") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // real purchases, split at the time midpoint: an interval OPENED in
    // batch 1 must be CLOSED by batch 2's first change for that user
    val evs = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy("ts")
      .as[(Long, Long, Timestamp, Double)].collect()
    val mid = evs(evs.length / 2)._3
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    withRocksDB {
      val q = scd2Stream(
        in.toDF().toDF("userId", "eventId", "ts", "value")
          .as[PriorityStreams.Scd2Event])
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    // upsert by (userId, validFrom): the LAST emission for a key wins
    // (memory sink appends in emission order within and across batches)
    val upserted = spark.table("scd2_out")
      .select("userId", "validFrom", "validTo", "value", "isCurrent")
      .as[(Long, Timestamp, Option[Timestamp], Double, Boolean)].collect()
      .zipWithIndex
      .groupBy(r => (r._1._1, r._1._2)).map { case (_, rs) => rs.maxBy(_._2)._1 }
      .toSet
    val batch = graft.SparkEntry.queries("scd2_intervals")(spark, dir)
      .select("user_id", "valid_from", "valid_to", "value", "is_current")
      .as[(Long, Timestamp, Option[Timestamp], Double, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    assert(upserted == batch,
      s"stream-batch diff: ${(upserted diff batch).take(3)} / ${(batch diff upserted).take(3)}")
  }

  test("streaming quota == batch quota_admit on the same event-time-ordered input") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // real events, split at the time midpoint: windows straddling the split
    // must carry their admitted-counter across micro-batches
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("ts"))
      .orderBy("ts")
      .as[(String, Long, Timestamp)].collect()
    val mid = evs(evs.length / 2)._3
    val in = MemoryStream[(String, Long, Timestamp)]
    withRocksDB {
      val q = quotaStream(
        in.toDF().toDF("bucket", "eventId", "ts").as[PriorityStreams.QuotaEvent], n = 50)
        .writeStream.format("memory").queryName("quota_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    // one decision per event, then the same accounting as the batch query
    val decisions = spark.table("quota_out")
      .select("bucket", "dayStartMs", "eventId", "admitted")
      .as[(String, Long, Long, Boolean)].collect()
    assert(decisions.length == evs.length)
    val streamAgg = decisions.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      k -> (ds.count(_._4), ds.count(!_._4))
    }
    val batch = graft.SparkEntry.queries("quota_admit")(spark, dir)
      .select(col("event_type"),
        unix_timestamp(col("day").cast("timestamp")) * 1000, // UTC session: date -> day-start ms
        col("n_admitted"), col("n_dropped"))
      .as[(String, Long, Long, Long)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (bucket, dayMs, nAdm, nDrop) =>
      val (sAdm, sDrop) = streamAgg((bucket, dayMs))
      assert(sAdm.toLong == nAdm && sDrop.toLong == nDrop,
        s"($bucket, $dayMs): stream ($sAdm, $sDrop) != batch ($nAdm, $nDrop)")
    }
  }

  test("streaming feature window == batch feature_window on the same in-order input") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Timestamp, Double)].collect()
    val mid = evs(evs.length / 2)._3
    withRocksDB {
      val in = MemoryStream[(Long, Long, Timestamp, Double)]
      val q = featureWindowStream(
        in.toDF().toDF("userId", "eventId", "ts", "value").as[ValuedEvent], n = 3)
        .writeStream.format("memory").queryName("fw_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    val streamed = spark.table("fw_out")
      .select("userId", "eventId", "nCtx", "ctxSumCents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    // batch twin: ctx_sum is an exact decimal-cents sum cast to double, so
    // round(x*100) recovers the cents losslessly
    val batch = graft.SparkEntry.queries("feature_window")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(math.round(r.getDouble(3) * 100)))).toSet
    assert(streamed.size == batch.size)
    assert(streamed == batch,
      s"stream/batch diverged; examples: ${(streamed -- batch).take(3)} vs ${(batch -- streamed).take(3)}")
  }

  test("checkpoint recovery: a restarted funnel stream resumes state, no double counting") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .orderBy("ts")
      .as[(Long, String, Timestamp)].collect()
    val mid = evs(evs.length / 2)._3
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-funnel-recover").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    import spark.implicits._
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("userId BIGINT, eventType STRING, ts TIMESTAMP")
        .parquet(srcDir).as[FunnelEvent]
      val q = funnelStream(src)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelAdvance], _: Long) =>
          b.collect().foreach(a => collected.synchronized { collected += ((a.userId, a.step)) }); ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      q.processAllAvailable(); q.stop()
    }
    withRocksDB {
      // run 1: first-half files, then STOP — per-user state survives only
      // in the checkpoint (file source tracks processed files there too)
      evs.filter(e => !e._3.after(mid)).toSeq
        .toDF("userId", "eventType", "ts")
        .coalesce(1).write.mode("overwrite").parquet(srcDir)
      runOnce()
      // run 2: append second-half files, a NEW query on the SAME
      // checkpoint — recovery must resume the state store and process
      // ONLY the new files
      evs.filter(e => e._3.after(mid)).toSeq
        .toDF("userId", "eventType", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)
      runOnce()
    }
    // recovered run must produce exactly the uninterrupted result: each
    // (user, step) advancement once, counts equal to the batch funnel
    val advances = collected.toSet
    assert(collected.size == advances.size, "restart double-counted an advancement")
    val batch = graft.SparkEntry.queries("funnel_steps")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(advances.count(_._2 == 1).toLong == batch("1_click"))
    assert(advances.count(_._2 == 2).toLong == batch("2_signup"))
    assert(advances.count(_._2 == 3).toLong == batch("3_purchase"))
  }

  test("space-saving heavy hitters: exact when distinct tokens <= m, bounded state otherwise") {
    implicit val sql = spark.sqlContext
    withRocksDB {
      // ---- exact regime: 6 distinct tokens, m=16 — counts must equal the
      // batch groupBy count, err 0, across two micro-batches
      val zipf = Seq("a" -> 30, "b" -> 20, "c" -> 12, "d" -> 7, "e" -> 4, "f" -> 2)
      val events = zipf.flatMap { case (t, n) => Seq.fill(n)(TokenEvent("buck", t)) }
      val (first, second) = events.splitAt(events.length / 2)
      val in = MemoryStream[TokenEvent]
      @volatile var last: Array[HeavyHitter] = Array.empty
      val q = heavyHittersStream(in.toDS(), m = 16, k = 4)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
          val rows = b.collect(); if (rows.nonEmpty) last = rows; ()
        }
        .outputMode("update").start()
      in.addData(first); q.processAllAvailable()
      in.addData(second); q.processAllAvailable(); q.stop()
      val expected = zipf.sortBy { case (t, n) => (-n, t) }.take(4)
      assert(last.map(h => (h.token, h.cnt)).toSeq == expected.map { case (t, n) => (t, n.toLong) })
      assert(last.forall(_.err == 0L), "exact regime must carry zero error")

      // ---- bounded regime: 100 distinct tokens, m=10 — at most m counters
      // survive, the true heavy hitter is present, counts only overestimate
      val hot = Seq.fill(50)(TokenEvent("b2", "HOT"))
      val tail = (1 to 100).map(i => TokenEvent("b2", f"t$i%03d"))
      val in2 = MemoryStream[TokenEvent]
      @volatile var last2: Array[HeavyHitter] = Array.empty
      val q2 = heavyHittersStream(in2.toDS(), m = 10, k = 10)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
          val rows = b.collect(); if (rows.nonEmpty) last2 = rows; ()
        }
        .outputMode("update").start()
      in2.addData(scala.util.Random.shuffle(hot ++ tail)); q2.processAllAvailable(); q2.stop()
      assert(last2.length <= 10)
      val hotRow = last2.find(_.token == "HOT")
      assert(hotRow.isDefined, s"true heavy hitter missing from ${last2.map(_.token).toSeq}")
      assert(hotRow.get.cnt >= 50, "space-saving must never undercount")
      assert(hotRow.get.cnt - hotRow.get.err <= 50, "cnt - err must lower-bound the true count")
    }
  }

  test("space-saving heavy hitters: TTL reclaims idle counters, fresh ones survive") {
    implicit val sql = spark.sqlContext
    withRocksDB {
      // Under TimeMode.ProcessingTime the engine schedules batches
      // CONTINUOUSLY to advance the TTL clock (shouldRunAnotherBatch is
      // true whenever processing-time state exists) — so neither
      // processAllAvailable nor Trigger.AvailableNow ever settles. Each
      // step therefore runs a short-lived query against a shared
      // checkpoint, POLLS the foreachBatch capture for the expected
      // output, and stops the query explicitly. The restart between steps
      // additionally pins that TTL expiry survives recovery.
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl").toString
      val in = MemoryStream[TokenEvent]
      @volatile var last: Array[HeavyHitter] = Array.empty
      def step(expect: Array[HeavyHitter] => Boolean): Unit = {
        val q = heavyHittersStream(in.toDS(), m = 16, k = 16,
            ttl = Some(java.time.Duration.ofMillis(800)))
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
            val rows = b.collect(); if (rows.nonEmpty) last = rows; ()
          }
          .outputMode("update").start()
        try {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (!expect(last) && System.nanoTime() < deadline) Thread.sleep(100)
        } finally q.stop()
        assert(expect(last), s"step did not reach expected output: ${last.toSeq}")
      }
      // step 1: two tokens tracked
      in.addData(Seq.fill(5)(TokenEvent("buck", "old")) :+ TokenEvent("buck", "also"))
      step(_.map(_.token).toSet == Set("old", "also"))
      // idle past the TTL: the step-1 counters must expire
      Thread.sleep(2000)
      // step 2: a new token arrives — expired counters are gone, so the
      // emitted state is exactly the newcomer with a fresh (1, 0) counter,
      // NOT m-full state evicting a minimum
      in.addData(TokenEvent("buck", "fresh"))
      step(_.map(h => (h.token, h.cnt, h.err)).toSeq == Seq(("fresh", 1L, 0L)))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("event-time timers: idle bucket fires once after the gap, state evicted") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, Long, Timestamp)]
    val events = in.toDF().toDF("bucket", "eventId", "ts")
      .withWatermark("ts", "0 seconds")
      .as[PriorityStreams.TimedEvent]
    withRocksDB {
      val q = PriorityStreams.idleBuckets(events, gapMs = 60_000) // 1 minute
        .writeStream.format("memory").queryName("idle_out")
        .outputMode("append").start()
      // batch 1: two purchase events, one signup
      in.addData(
        ("purchase", 1L, ts("2024-01-01 00:00:10")),
        ("purchase", 2L, ts("2024-01-01 00:00:40")),
        ("signup", 3L, ts("2024-01-01 00:00:50")))
      q.processAllAvailable()
      assert(spark.table("idle_out").isEmpty) // watermark hasn't passed any gap
      // batch 2: signup stays active; purchase goes quiet. Watermark moves to
      // 00:03:00, far past purchase's 00:00:40 + 60s => its timer fires.
      in.addData(("signup", 4L, ts("2024-01-01 00:03:00")))
      q.processAllAvailable()
      // batch 3: advance watermark past signup's gap too
      in.addData(("click", 5L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable(); q.stop()
      val idles = spark.table("idle_out").as[PriorityStreams.BucketIdle]
        .collect().map(i => i.bucket -> i).toMap
      // purchase idled exactly once at its true last event time with count 2
      assert(idles.keySet == Set("purchase", "signup"))
      assert(idles("purchase").lastEventTs == ts("2024-01-01 00:00:40"))
      assert(idles("purchase").events == 2)
      assert(idles("signup").lastEventTs == ts("2024-01-01 00:03:00"))
      assert(idles("signup").events == 2)
    }
  }

  test("stream-static decontamination flags exactly the batch twin's contaminated docs") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.load(spark, dir, "documents")
    // batch twin (the oracle-checked decontaminate query's candidate logic):
    // bench = shingles of held-out docs (doc_id % 97 == 0); contaminated =
    // corpus docs sharing any shingle
    val sh = docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      // the SAME shared shingle expression production uses — a drifting
      // inline copy here would make this spec verify the wrong thing
      .select(col("doc_id"), explode(expr(graft.queries.CurationQueries.shingles5)).as("s"))
    val bench = sh.filter($"doc_id" % 97 === 0).select("s").distinct()
    val expected = sh.filter($"doc_id" % 97 =!= 0)
      .join(bench, Seq("s"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(expected.nonEmpty, "sf0.01 corpus should have contaminated docs")
    // streaming side: corpus docs arrive over two micro-batches
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val in = MemoryStream[(Long, String, Timestamp)]
    val flagged = decontaminateStream(
      in.toDF().toDF("doc_id", "text", "ts"), bench)
    val q = flagged.writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    in.addData(b1.map { case (id, t) => (id, t, ts("2024-01-01 00:00:01")) })
    q.processAllAvailable()
    in.addData(b2.map { case (id, t) => (id, t, ts("2024-01-01 00:00:02")) })
    q.processAllAvailable(); q.stop()
    val got = spark.table("decon_out").select("doc_id").as[Long].collect()
    assert(got.length == got.distinct.length, "a doc must be flagged once, not per shingle")
    assert(got.toSet == expected)
  }

  test("streaming quantization emits exactly the batch twin's scale and codes") {
    implicit val sql = spark.sqlContext
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    // batch twin: the oracle-checked quantization (same shared function)
    val expected = graft.queries.SimilarityQueries.quantized(emb)
      .select($"vec_id", $"scale", $"qv").as[(Long, Double, Seq[Int])]
      .collect().map { case (id, sc, q) => id -> ((sc, q)) }.toMap
    assert(expected.nonEmpty)
    // streaming side: vectors arrive over two micro-batches
    val rows = emb.as[(Long, Seq[Float])].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = quantizeStream(in.toDF().toDF("vec_id", "embedding"))
      .select("vec_id", "scale", "qv")
      .writeStream.format("memory").queryName("quant_out")
      .outputMode("append").start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable(); q.stop()
    val got = spark.table("quant_out").as[(Long, Double, Seq[Int])]
      .collect().map { case (id, sc, qv) => id -> ((sc, qv)) }.toMap
    assert(got == expected)
  }

  test("FAIR pool xml: one pool per bucket, weight = allocation") {
    val xml = PriorityPools.allocationFileXml(cfg)
    assert(xml.contains("<pool name=\"purchase\">"))
    assert(xml.contains("<weight>70</weight>"))
    assert(xml.contains("<pool name=\"signup\">"))
    assert(xml.contains("<weight>30</weight>"))
  }

  test("per-bucket kafka assign json lists exactly the bucket's partitions") {
    assert(PriorityPools.assignJson(cfg, 10, "purchase") == """{"events":[0,1,2,3,4,5,6]}""")
    assert(PriorityPools.assignJson(cfg, 10, "signup") == """{"events":[7,8,9]}""")
  }

  test("per-bucket kafka reader options carry the assignment and bootstrap") {
    val opts = PriorityPools.kafkaSourceOptions(cfg, 10, "signup", "broker1:9092,broker2:9092")
    assert(opts("assign") == """{"events":[7,8,9]}""")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("startingOffsets") == "earliest")
  }

  test("nearDupAlertStream: planted near-dup and exact copy alert once; unrelated doc silent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.Tables.load(spark, dir, "documents").select("doc_id", "text")
    val index = PriorityStreams.nearDupIndex(corpus).cache()
    val Array(tgt1, tgt2) = corpus.filter(col("doc_id").isin(7L, 11L))
      .orderBy("doc_id").collect().map(_.getString(1))
    // near-dup: one token of doc 7 edited; exact copy of doc 11; unrelated noise
    val edited = { val t = tgt1.split(" "); t(t.length / 2) = "zzznovel"; t.mkString(" ") }
    val t0 = ts("2024-01-01 00:00:00")
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = PriorityStreams.nearDupAlertStream(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", index)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    in.addData(
      (100001L, edited, t0),
      (100002L, tgt2, t0),
      (100003L, Seq.tabulate(40)(i => s"nonsense$i").mkString(" "), t0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("neardup_out")
      .select("doc_id", "dup_of", "jacc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc.contains(100001L) && byDoc(100001L).exists(_._2 == 7L),
      s"edited doc did not alert against doc 7: ${got.toSeq}")
    assert(byDoc(100002L).exists(t => t._2 == 11L && t._3 == 1.0),
      s"exact copy did not alert with jacc 1.0: ${got.toSeq}")
    assert(!byDoc.contains(100003L), s"unrelated doc alerted: ${got.toSeq}")
    // multi-band candidates collapsed: exactly one alert per (doc, dup_of)
    assert(got.groupBy(t => (t._1, t._2)).forall(_._2.length == 1),
      s"duplicate alerts not collapsed: ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("driftStream with the corpus mix as reference ≡ batch type_drift, exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"))
    // reference = the batch corpus's own global mix via the SHARED helper,
    // which uses the same LnGrid construction as the batch query's global
    // term — the r8 supply-chain pin
    val ref = PriorityStreams.typeDriftRefMix(events)
    val expected = graft.SparkEntry.queries("type_drift")(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
    val rows = events.collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).toSeq
    val in = MemoryStream[(Timestamp, String)]
    val q = PriorityStreams.driftStream(
        in.toDF().toDF("ts", "event_type"), "ts", "event_type", "6 hours", ref,
        watermark = "1 second")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    in.addData(rows: _*); q.processAllAvailable()
    // sentinel far past the data pushes the watermark so every real window closes
    val sentinel = new Timestamp(rows.map(_._1.getTime).max + 30L * 86400000L)
    in.addData((sentinel, rows.head._2)); q.processAllAvailable(); q.stop()
    val got = spark.table("drift_out")
      .filter(col("w_start") < new Timestamp(sentinel.getTime - 86400000L))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(3))).toSet
    assert(spark.table("drift_out").agg(sum("n_other")).head().getLong(0) == 0L)
    assert(got == expected,
      s"stream/batch drift mismatch: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("anomalyStream with the corpus's own daily stats ≡ batch daily_anomalies, exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"))
    // reference = the batch corpus's own per-type daily profile — the
    // exact (n, Σc, Σc²) integers the batch query derives internally
    val ref = events.groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("ss"),
        sum(col("c") * col("c")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = graft.SparkEntry.queries("daily_anomalies")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    val rows = events.collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).toSeq
    val in = MemoryStream[(Timestamp, String)]
    val q = PriorityStreams.anomalyStream(
        in.toDF().toDF("ts", "event_type"), "ts", "event_type", ref,
        watermark = "1 second")
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    in.addData(rows: _*); q.processAllAvailable()
    // sentinel far past the data pushes the watermark so every real day
    // closes; a second, later one closes the first sentinel's own window
    val sentinel = new Timestamp(rows.map(_._1.getTime).max + 30L * 86400000L)
    in.addData((sentinel, "not-a-type")); q.processAllAvailable()
    in.addData((new Timestamp(sentinel.getTime + 30L * 86400000L), "click"))
    q.processAllAvailable(); q.stop()
    val out = spark.table("anomaly_out")
    val got = out
      .filter(col("w_start") < new Timestamp(sentinel.getTime - 86400000L))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate.toString,
        r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    assert(got == expected,
      s"stream/batch anomaly mismatch: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the unknown-type sentinel is SURFACED (novel types must not vanish)
    // but unscored — no reference stats row to score it against
    val novel = out.filter(col("event_type") === "not-a-type").collect()
    assert(novel.length == 1 && novel.head.isNullAt(3) && novel.head.isNullAt(4),
      s"novel type not surfaced unscored: ${novel.toSeq}")
  }

  test("streaming transition extraction == batch transition_matrix counts across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // event-time-ordered feed (the across-batch contract); split mid-stream
    // so per-user last-event state must carry between micro-batches
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Timestamp, String)].collect()
    val mid = evs(evs.length / 2)._3
    withRocksDB {
      val in = MemoryStream[(Long, Long, Timestamp, String)]
      val q = transitionStream(
        in.toDF().toDF("userId", "eventId", "ts", "eventType")
          .as[PriorityStreams.TransEvent])
        .writeStream.format("memory").queryName("trans_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    val streamed = spark.table("trans_out")
      .groupBy("cur", "nxt").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.SparkEntry.queries("transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch transition counts diverged: ${
        (streamed.toSet diff batch.toSet).take(3)} vs ${(batch.toSet diff streamed.toSet).take(3)}")
    // total transition mass: every user contributes exactly (events - 1)
    val nUsers = evs.map(_._1).distinct.length
    assert(streamed.values.sum == evs.length - nUsers)
  }

  test("streaming sequence scoring == batch event_seq_logprob exactly; novel transitions surface unscored") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the static model via the SHARED LnGrid builder — the exact frame the
    // batch scorer sums (r8 supply-chain pin)
    val model = graft.queries.FunnelQueries.transitionModelLn6(
      graft.queries.FunnelQueries.userTransitionCounts(
        graft.Tables.load(spark, dir, "events")))
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Timestamp, String)].collect()
    val mid = evs(evs.length / 2)._3
    // one NOVEL-type event for an existing user, later than everything —
    // its (last_type → zzz) transition is absent from the model
    val novelUser = evs.last._1
    val novel = (novelUser, evs.map(_._2).max + 1,
      new Timestamp(evs.map(_._3.getTime).max + 60000L), "zzz")
    withRocksDB {
      val in = MemoryStream[(Long, Long, Timestamp, String)]
      val q = PriorityStreams.seqScoreStream(
        in.toDF().toDF("userId", "eventId", "ts", "eventType")
          .as[PriorityStreams.TransEvent], model)
        .writeStream.format("memory").queryName("seqscore_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)) :+ novel)
      q.processAllAvailable(); q.stop()
    }
    val out = spark.table("seqscore_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // the novel transition surfaced, unscored
    val nv = out.filter(_._3 == "zzz")
    assert(nv.length == 1 && nv.head._4.isEmpty && !nv.head._5,
      s"novel transition not surfaced unscored: ${nv.toSeq}")
    // every in-model transition scored; per-user (Σ lp6)/(n·1e6) reproduces
    // the batch scorer EXACTLY (same int sum, same final double division)
    val scored = out.filter(_._3 != "zzz")
    assert(scored.forall(_._5), "self-scored corpus must find every transition seen")
    val perUser = scored.groupBy(_._1).map { case (u, xs) =>
      val sl = xs.map(_._4.get).sum
      u -> (xs.length.toLong, sl.toDouble / (xs.length.toLong * 1000000L).toDouble)
    }
    val batch = graft.SparkEntry.queries("event_seq_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batch.nonEmpty)
    // the novel event adds one extra streamed transition for novelUser
    // (prev → zzz is excluded above, so counts still line up)
    assert(perUser == batch,
      s"stream/batch sequence scores diverged: ${
        (perUser.toSet diff batch.toSet).take(3)} vs ${(batch.toSet diff perUser.toSet).take(3)}")
  }

  test("streaming chained debounce == in-process replay across a batch split; keeps ⊇ batch gap rule") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val gapUs = 300000000L
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Timestamp, String)].collect()
    val mid = evs(evs.length / 2)._3
    withRocksDB {
      val in = MemoryStream[(Long, Long, Timestamp, String)]
      val q = PriorityStreams.debounceStream(
        in.toDF().toDF("userId", "eventId", "ts", "eventType")
          .as[PriorityStreams.DebounceEvent], gapUs)
        .writeStream.format("memory").queryName("debounce_out")
        .outputMode("update").start()
      in.addData(evs.filter(e => !e._3.after(mid)))
      q.processAllAvailable()
      in.addData(evs.filter(e => e._3.after(mid)))
      q.processAllAvailable(); q.stop()
    }
    val got = spark.table("debounce_out").collect()
      .map(r => r.getLong(2) -> r.getBoolean(3)).toMap
    assert(got.size == evs.length, "one decision per event")
    // chained replay in-process: kept iff > gap after the last KEPT
    val expected = evs.groupBy(e => (e._1, e._4)).toSeq.flatMap { case (_, es) =>
      var lk = Long.MinValue
      // full-precision micros (the tsMicros discipline): the sub-ms residue
      // lives in the nanos field, getTime alone truncates it — both the
      // sort key and the gap arithmetic must see it
      es.map(e => (e._3.getTime * 1000L + (e._3.getNanos / 1000L) % 1000L, e._2))
        .sortBy(identity).map { case (us, id) =>
          val keep = lk == Long.MinValue || us - lk > gapUs
          if (keep) lk = us
          id -> keep
        }
    }.toMap
    assert(got == expected, s"chained debounce diverged on ${
      expected.count { case (id, k) => got(id) != k }} events")
    // the batch query's gap-to-previous kept set is a SUBSET of chained-kept
    val batchKeptPerType = graft.SparkEntry.queries("debounce_events")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val chainedKeptPerType = evs.filter(e => got(e._2)).groupBy(_._4)
      .map { case (t, xs) => t -> xs.length.toLong }
    batchKeptPerType.foreach { case (t, nBatch) =>
      assert(chainedKeptPerType(t) >= nBatch,
        s"$t: chained kept ${chainedKeptPerType(t)} < batch gap-rule kept $nBatch")
    }
  }

  test("holtStream emissions == batch holt_smooth rows bit-for-bit across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2))).sortBy(x => (x._2, x._1))
    val mid = daily(daily.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(String, Long, Long)]
      val q = PriorityStreams.holtStream(
        in.toDF().toDF("eventType", "epochDay", "c")
          .as[PriorityStreams.DayCount])
        .writeStream.format("memory").queryName("holt_out")
        .outputMode("update").start()
      in.addData(daily.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(daily.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val streamed = spark.table("holt_out").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val batch = graft.SparkEntry.queries("holt_smooth")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        (r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(batch.nonEmpty && streamed.keySet == batch.keySet)
    val diverged = batch.filter { case (k, v) => streamed(k) != v }
    assert(diverged.isEmpty, s"stream/batch Holt diverged on ${diverged.take(3)}")
  }

  test("medianStream emissions == batch rolling_median_volume bit-for-bit across a split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2))).sortBy(x => (x._2, x._1))
    val mid = daily(daily.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(String, Long, Long)]
      val q = PriorityStreams.medianStream(
        in.toDF().toDF("eventType", "epochDay", "c")
          .as[PriorityStreams.DayCount])
        .writeStream.format("memory").queryName("median_out")
        .outputMode("update").start()
      in.addData(daily.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(daily.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val streamed = spark.table("median_out").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val batch = graft.SparkEntry.queries("rolling_median_volume")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(batch.nonEmpty && streamed.keySet == batch.keySet)
    val diverged = batch.filter { case (k, v) => streamed(k) != v }
    assert(diverged.isEmpty, s"stream/batch medians diverged on ${diverged.take(3)}")
  }

  test("cmsStream final sketch == in-process batch sketch; top-20 estimates == registry query") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val mid = toks(toks.length / 2)._1
    withRocksDB {
      val in = MemoryStream[String]
      val q = PriorityStreams.cmsStream(
        in.toDF().toDF("token").as[PriorityStreams.TokenObs])
        .writeStream.format("memory").queryName("cms_out")
        .outputMode("update").start()
      in.addData(toks.filter(_._1 <= mid).map(_._2))
      q.processAllAvailable()
      in.addData(toks.filter(_._1 > mid).map(_._2))
      q.processAllAvailable(); q.stop()
    }
    // final counter per cell = max emission (counters are monotone)
    val streamed = spark.table("cms_out").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    // in-process batch sketch via the SAME bucket rule
    val expected = toks.map(_._2).flatMap(PriorityStreams.cmsBuckets)
      .groupBy(c => (c.j, c.b)).map { case (k, xs) => k -> xs.size.toLong }
    assert(streamed == expected, s"sketch diverged on ${
      (streamed.toSet diff expected.toSet).take(3)} vs ${
      (expected.toSet diff streamed.toSet).take(3)}")
    // estimates from the STREAMED sketch reproduce the registry query's
    // cms_est column for the top-20 exactly
    val batch = graft.SparkEntry.queries("cms_estimate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(batch.nonEmpty)
    batch.foreach { case (t, est) =>
      val mine = PriorityStreams.cmsBuckets(t)
        .map(c => streamed((c.j, c.b))).min
      assert(mine == est, s"$t: streamed-sketch estimate $mine != batch $est")
    }
  }

  test("islandsStream closed+latest-open rows == batch gaps_islands across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val days = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .sortBy(x => (x._2, x._1))
    val mid = days(days.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(Long, Long)]
      val q = PriorityStreams.islandsStream(
        in.toDF().toDF("userId", "epochDay").as[PriorityStreams.DayEvent])
        .writeStream.format("memory").queryName("islands_out")
        .outputMode("update").start()
      in.addData(days.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(days.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val rows = spark.table("islands_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val closed = rows.filter(_._5).map(r => (r._1, r._2, r._3, r._4)).toSet
    // latest open row per (user, start) = max endDay (monotone across
    // batches); a closed row for the same (user, start) supersedes it
    val open = rows.filter(!_._5).groupBy(r => (r._1, r._2))
      .map { case (_, rs) => rs.maxBy(_._3) }
      .filter(r => !closed.exists(c => c._1 == r._1 && c._2 == r._2))
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    val streamed = closed ++ open
    val batch = graft.SparkEntry.queries("gaps_islands")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDate(2).toLocalDate.toEpochDay, r.getLong(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch, s"stream/batch islands diverged: ${
      (streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("lifecycleStream per-week classifications == batch lifecycle_states across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val weeks = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .sortBy(x => (x._2, x._1))
    val mid = weeks(weeks.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(Long, Long)]
      val q = PriorityStreams.lifecycleStream(
        in.toDF().toDF("userId", "weekDay").as[PriorityStreams.WeekEvent])
        .writeStream.format("memory").queryName("lifecycle_out")
        .outputMode("update").start()
      in.addData(weeks.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(weeks.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val rows = spark.table("lifecycle_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // each (user, week) classified exactly once; churned at most once per gap
    assert(rows.groupBy(r => (r._1, r._2, r._3 == "churned")).values.forall(_.size == 1),
      "duplicate lifecycle emission")
    val perWeek = rows.filter(_._3 != "churned")
      .groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.size.toLong }
    val batch = graft.SparkEntry.queries("lifecycle_states")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(batch.nonEmpty)
    batch.foreach { case (wk, nNew, nRet, nRes, _) =>
      assert(perWeek.getOrElse((wk, "new"), 0L) == nNew, s"week $wk new")
      assert(perWeek.getOrElse((wk, "retained"), 0L) == nRet, s"week $wk retained")
      assert(perWeek.getOrElse((wk, "resurrected"), 0L) == nRes, s"week $wk resurrected")
    }
    // churn: the stream emits exactly the GAP-PROVEN subset of the batch
    // column (a later week arrived, >7-day gap); the never-return tail is
    // right-censored until event-time timers flush it — replay that subset
    val byUser = weeks.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).sorted.toSeq }
    val expectedChurn = byUser.toSeq.flatMap { case (u, ws) =>
      ws.zip(ws.drop(1)).collect { case (a, b) if b > a + 7 => (u, a, "churned") }
    }.toSet
    val streamedChurn = rows.filter(_._3 == "churned").toSet
    assert(streamedChurn == expectedChurn, s"churn diverged: ${
      (streamedChurn diff expectedChurn).take(3)} vs ${
      (expectedChurn diff streamedChurn).take(3)}")
    // ...and it never exceeds the batch churn_next count for any week
    val churnPerWeek = streamedChurn.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    batch.foreach { case (wk, _, _, _, nChurn) =>
      assert(churnPerWeek.getOrElse(wk, 0L) <= nChurn, s"week $wk churn exceeds batch")
    }
  }

  test("lifecycleTimerStream: event-time timers flush churn == batch churn_next exactly") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val weeks = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .sortBy(x => (x._2, x._1))
    val maxWk = weeks.map(_._2).max
    val dayMs = 86400000L
    def row(u: Long, w: Long) = (u, w, new Timestamp(w * dayMs))
    val sentinel = -1L // excluded from every comparison below
    withRocksDB {
      val in = MemoryStream[(Long, Long, Timestamp)]
      val q = PriorityStreams.lifecycleTimerStream(
        in.toDF().toDF("userId", "weekDay", "ts")
          .withWatermark("ts", "0 seconds")
          .as[PriorityStreams.TimedWeekEvent])
        .writeStream.format("memory").queryName("lifecycle_timer_out")
        .outputMode("update").start()
      val mid = weeks(weeks.length / 2)._2
      in.addData(weeks.filter(_._2 <= mid).map(x => row(x._1, x._2)))
      q.processAllAvailable()
      in.addData(weeks.filter(_._2 > mid).map(x => row(x._1, x._2)))
      q.processAllAvailable()
      // push the watermark to day maxWk+13: every deadline (W+14)d with
      // W < maxWk is passed, but NOT the corpus-edge week's (maxWk+14)d —
      // exactly the batch query's right-censoring cut, proven by event time
      in.addData((sentinel, maxWk + 7, new Timestamp((maxWk + 13) * dayMs)))
      q.processAllAvailable()
      // one more batch so timers armed before the sentinel fire against
      // the advanced watermark (duplicate week: classification no-op)
      in.addData((sentinel, maxWk + 7, new Timestamp((maxWk + 13) * dayMs)))
      q.processAllAvailable(); q.stop()
    }
    val rows = spark.table("lifecycle_timer_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(_._1 != sentinel)
    assert(rows.groupBy(identity).values.forall(_.size == 1),
      "duplicate lifecycle emission (the churn latch must prevent double-fire)")
    val batch = graft.SparkEntry.queries("lifecycle_states")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(batch.nonEmpty)
    val perWeek = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.size.toLong }
    batch.foreach { case (wk, nNew, nRet, nRes, nChurn) =>
      assert(perWeek.getOrElse((wk, "new"), 0L) == nNew, s"week $wk new")
      assert(perWeek.getOrElse((wk, "retained"), 0L) == nRet, s"week $wk retained")
      assert(perWeek.getOrElse((wk, "resurrected"), 0L) == nRes, s"week $wk resurrected")
      // THE r10 claim: gap-proven + timer-flushed churn ≡ batch churn_next
      assert(perWeek.getOrElse((wk, "churned"), 0L) == nChurn, s"week $wk churned")
    }
    assert(rows.count(_._3 == "churned") ==
      batch.map(_._5).sum, "total churn mass must equal the batch column")
  }

  test("pageHinkleyStream per-day excursions == batch recursion across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .sortBy(x => (x._2, x._1))
    val mid = daily(daily.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(String, Long, Long)]
      val q = PriorityStreams.pageHinkleyStream(
        in.toDF().toDF("eventType", "epochDay", "c").as[PriorityStreams.DayCount])
        .writeStream.format("memory").queryName("ph_out")
        .outputMode("update").start()
      in.addData(daily.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(daily.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val streamed = spark.table("ph_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    // replay the exact batch recursion per type (the R10BatchSpec algebra)
    var expMax = Map.empty[String, Long]
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val series = rows.sortBy(_._2)
      var s = 0L; var ph = 0L; var runmin = Long.MaxValue; var mx = 0L
      series.zipWithIndex.foreach { case ((_, d, x), i) =>
        s += x
        ph += x * 1000000L - (s * 1000000L) / (i + 1)
        runmin = math.min(runmin, ph)
        val exc = ph - runmin
        mx = math.max(mx, exc)
        assert(streamed((t, d)) == ((exc, exc > 50000000L)), s"$t day $d excursion")
      }
      expMax += t -> mx
    }
    assert(streamed.size == daily.length, "one emission per (type, day)")
    // summary consistency with the batch query
    val batch = graft.SparkEntry.queries("page_hinkley_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    batch.foreach { case (t, (mx, nAlarm)) =>
      assert(expMax(t) == mx, s"$t replay max vs batch")
      val streamedForType = streamed.filter(_._1._1 == t)
      assert(streamedForType.values.map(_._1).max == mx, s"$t streamed max vs batch")
      assert(streamedForType.values.count(_._2).toLong == nAlarm, s"$t alarms vs batch")
    }
  }

  test("hllStream final registers == batch hll_distinct_audit across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val items = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val mid = items(items.length / 2)._3
    withRocksDB {
      val in = MemoryStream[(String, Long)]
      val q = PriorityStreams.hllStream(
        in.toDF().toDF("groupKey", "itemId").as[PriorityStreams.HllItem])
        .writeStream.format("memory").queryName("hll_out")
        .outputMode("update").start()
      in.addData(items.filter(_._3 <= mid).map(x => (x._1, x._2)))
      q.processAllAvailable()
      in.addData(items.filter(_._3 > mid).map(x => (x._1, x._2)))
      q.processAllAvailable(); q.stop()
    }
    // last emission per key = the current estimate (Update mode)
    val last = spark.table("hll_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap // Map keeps the LAST occurrence per key
    // THE max-merge claim: final stream registers == the batch sketch
    // bit-for-bit (occupancy, raw, and corrected estimate), despite the
    // mid-stream split and duplicate users across batches
    val batch = graft.SparkEntry.queries("hll_distinct_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(batch.nonEmpty && last.keySet == batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(last(t) == exp, s"$t streaming sketch diverged from batch")
    }
  }

  test("stickinessStream per-day counts == batch dau_stickiness across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ud = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .sortBy(x => (x._2, x._1))
    val mid = ud(ud.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(Long, Long)]
      val q = PriorityStreams.stickinessStream(
        in.toDF().toDF("userId", "epochDay").as[PriorityStreams.DayEvent])
        .writeStream.format("memory").queryName("stick_out")
        .outputMode("update").start()
      in.addData(ud.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(ud.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    val rows = spark.table("stick_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.groupBy(identity).values.forall(_.size == 1), "duplicate emission")
    assert(rows.length == ud.length, "one emission per (user, day)")
    val perDay = rows.groupBy(_._2).map { case (d, rs) =>
      d -> (rs.size.toLong, rs.count(_._3).toLong) }
    val batch = graft.SparkEntry.queries("dau_stickiness")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batch.nonEmpty)
    batch.foreach { case (d, dau, prevDau, nReturning) =>
      assert(perDay(d)._1 == dau, s"day $d dau")
      assert(perDay.getOrElse(d - 1, (0L, 0L))._1 == prevDau, s"day $d prev dau")
      // THE claim: "returning" emissions = the batch set intersection
      assert(perDay(d)._2 == nReturning, s"day $d returning")
    }
    // The complement (ADVICE r10): the stream also emits on days the batch
    // DROPS (the first day / any day after a corpus-wide gap — the batch
    // inner-join to day d−1 has no rows there). On those days `returning`
    // must be 0 by construction: no user was active on an empty/absent
    // previous day.
    val batchDays = batch.map(_._1).toSet
    val streamOnly = perDay.keySet -- batchDays
    assert(streamOnly.nonEmpty, "expected at least the first active day to be stream-only")
    streamOnly.foreach { d =>
      assert(perDay(d)._2 == 0L, s"stream-only day $d must have zero returning users")
    }
  }

  test("srmStream final counts == batch ab_srm_check across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ids = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).orderBy("doc_id").as[Long].collect()
    val mid = ids(ids.length / 2)
    withRocksDB {
      val in = MemoryStream[Long]
      val q = PriorityStreams.srmStream(in.toDF().toDF("doc_id"))
        .writeStream.format("memory").queryName("srm_out")
        .outputMode("update").start()
      in.addData(ids.filter(_ <= mid))
      q.processAllAvailable()
      in.addData(ids.filter(_ > mid))
      q.processAllAvailable(); q.stop()
    }
    val rows = spark.table("srm_out").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // running counts are monotone — the final state per arm is the max
    val finalCounts = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val b = graft.SparkEntry.queries("ab_srm_check")(spark, dir).collect().head
    val (n, oTrain, oVal, oTest) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    assert(finalCounts.getOrElse("train", 0L) == oTrain, "train count")
    assert(finalCounts.getOrElse("val", 0L) == oVal, "val count")
    assert(finalCounts.getOrElse("test", 0L) == oTest, "test count")
    assert(finalCounts.values.sum == n, "total")
    // the consumer's gate: the batch chain's three srmTerm cells over the
    // final stream counts reproduce the batch chi2 bit-for-bit
    import spark.implicits._
    val chi2 = Seq((n, oTrain, oVal, oTest)).toDF("n", "o_train", "o_val", "o_test")
      .select((graft.queries.SelectionQueries.srmTerm(col("o_train"), 204L)
        + graft.queries.SelectionQueries.srmTerm(col("o_val"), 26L)
        + graft.queries.SelectionQueries.srmTerm(col("o_test"), 26L)).as("chi2"))
      .collect().head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(chi2)
      == java.lang.Double.doubleToLongBits(b.getDouble(4)), "chi2 bits")
  }

  test("piiStream final rows == batch pii_audit across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("props"), col("event_type"))
      .orderBy("event_id")
      .as[(Long, Long, String, String)].collect()
    val mid = events(events.length / 2)._1
    withRocksDB {
      val in = MemoryStream[(Long, Long, String, String)]
      val q = PriorityStreams.piiStream(
          in.toDF().toDF("event_id", "user_id", "props", "event_type"))
        .writeStream.format("memory").queryName("pii_out")
        .outputMode("update").start()
      in.addData(events.filter(_._1 <= mid))
      q.processAllAvailable()
      in.addData(events.filter(_._1 > mid))
      q.processAllAvailable(); q.stop()
    }
    // running rows are nRows-monotone — the final state per type is the max
    // (13 count columns since r14's card/IP classes)
    val fin = spark.table("pii_out").collect()
      .map(r => (r.getString(0), (1 to 13).map(r.getLong).toVector))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_.head)).toMap
    val batch = graft.SparkEntry.queries("pii_audit")(spark, dir).collect()
      .map(r => (r.getString(0),
        ((1 to 13).map(r.getLong).toVector, r.getDouble(14)))).toMap
    assert(fin.keySet == batch.keySet, "event types")
    fin.foreach { case (t, counts) =>
      assert(counts == batch(t)._1, s"$t accounting")
      // the consumer's gate: share_clean is ONE bare division over the
      // final stream counts, bit-equal to the batch column
      val share = counts.last.toDouble / counts.head.toDouble
      assert(java.lang.Double.doubleToLongBits(share)
        == java.lang.Double.doubleToLongBits(batch(t)._2), s"$t share_clean bits")
    }
  }

  test("qualityBandStream final hist == batch; replayed Otsu argmax == registry row") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val mid = docs(docs.length / 2)._1
    withRocksDB {
      val in = MemoryStream[(Long, String)]
      val q = PriorityStreams.qualityBandStream(
          in.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("qband_out")
        .outputMode("update").start()
      in.addData(docs.filter(_._1 <= mid))
      q.processAllAvailable()
      in.addData(docs.filter(_._1 > mid))
      q.processAllAvailable(); q.stop()
    }
    // running counts are monotone — final state per band is the max
    val fin = spark.table("qband_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchHist = graft.queries.SelectionQueries
      .qualityBand(graft.Tables.load(spark, dir, "documents"))
      .groupBy("g").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fin == batchHist, s"stream hist $fin != batch $batchHist")
    // the consumer's gate: Otsu between-class argmax over the FINAL stream
    // counts reproduces the registry row exactly (BigInt replay)
    val ww = fin.values.map(BigInt(_)).sum
    val mm = fin.map { case (g, c) => BigInt(g) * c }.sum
    val cand = fin.toSeq.sorted.scanLeft((0L, BigInt(0), BigInt(0))) {
      case ((_, w0, m0), (g, c)) => (g, w0 + c, m0 + BigInt(g) * c)
    }.drop(1).filter(_._2 < ww).map { case (g, w0, m0) =>
      val a = m0 * (ww - w0) - (mm - m0) * w0
      (g, w0, m0, (a * a) / (w0 * (ww - w0)))
    }
    val best = cand.minBy { case (g, _, _, score) => (-score, g) }
    val row = graft.SparkEntry.queries("otsu_quality_threshold")(spark, dir)
      .collect().head
    assert(row.getLong(0) == best._1, "best_band")
    assert(row.getLong(1) == best._2.toLong, "n_below")
    assert(row.getLong(5) == best._4.toLong, "between_var_score")
  }

  test("packStream final accounting == batch pack_efficiency streams across a batch split") {
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
      .as[(String, Long, Long)].collect()
    val mid = docs(docs.length / 2)._2
    withRocksDB {
      val in = MemoryStream[(String, Long, Long)]
      val q = PriorityStreams.packStream(
        in.toDF().toDF("source", "docId", "nTokens")
          .as[PriorityStreams.PackDoc], 256L)
        .writeStream.format("memory").queryName("pack_out")
        .outputMode("update").start()
      in.addData(docs.filter(_._2 <= mid))
      q.processAllAvailable()
      in.addData(docs.filter(_._2 > mid))
      q.processAllAvailable(); q.stop()
    }
    // last emission per key (memory sink in update mode appends; keep the
    // final row per (source, blk))
    val got = spark.table("pack_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap // Map keeps the LAST occurrence per key
    // batch recompute of the packer streams at L = 256
    val expected = docs.groupBy(d => (d._1, d._2 / 200L)).map { case (k, ds) =>
      val toks = ds.map(_._3).sum
      val packs = (toks + 255L) / 256L
      k -> (ds.length.toLong, toks, packs, packs * 256L - toks)
    }
    assert(got == expected, "final streaming accounting diverged from batch")
    // roll-up ties to the registry's pack_efficiency L = 256 rows exactly
    val batch = graft.SparkEntry.queries("pack_efficiency")(spark, dir)
      .filter(col("pack_len") === 256L).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val rolled = got.toSeq.groupBy(_._1._1).map { case (src, ks) =>
      src -> (ks.length.toLong, ks.map(_._2._2).sum, ks.map(_._2._3).sum,
        ks.map(_._2._4).sum)
    }
    assert(rolled == batch, "roll-up diverged from the registry query")
  }
}

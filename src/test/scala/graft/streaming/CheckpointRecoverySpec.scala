package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.PriorityStreams._

/** Checkpoint-recovery parity for every stateful streaming twin (r9,
  * verdict item 2): stop on a checkpoint mid-stream, restart a NEW query
  * on the SAME checkpoint, and the combined emissions must equal an
  * uninterrupted run over the same input — the reference's
  * rebalance-re-evaluation semantics (`AssignorTest:226-343`: a consumer
  * group change must re-derive the same assignment, never a fresh or
  * doubled one) lifted to state-store recovery. The funnel state machine
  * got this in r5 (PriorityStreamsSpec); these cover the remaining
  * nontrivial-state twins: transition extraction, Holt smoothing, rolling
  * median, count-min sketch, gaps-and-islands, and packer accounting.
  *
  * Method per twin: a file (parquet) source — the file source records
  * processed files in the SAME checkpoint as the state store, so a
  * restart resumes both input progress and state together. Run A consumes
  * everything in one query (the uninterrupted truth); run B consumes half,
  * stops, appends the second half, and restarts on the same checkpoint.
  * A lost state store would make run B's second leg re-derive
  * first-batch state (double-counted counters, re-opened streaks, reset
  * smoothing recursions) — exactly what each assert rejects.
  */
class CheckpointRecoverySpec extends SparkTestBase {
  import spark.implicits._

  /** Write `batches` to a fresh source dir one per query-run, each run a
    * NEW streaming query on the SHARED checkpoint; return all emissions in
    * arrival order (order only matters for last-emission-per-key twins). */
  private def driveRuns[O](
      schema: String,
      batches: Seq[DataFrame],
      mk: DataFrame => Dataset[O]): Seq[O] = {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val collected = scala.collection.mutable.ArrayBuffer.empty[O]
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(srcDir)
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = mk(src).writeStream
        .foreachBatch { (d: Dataset[O], _: Long) =>
          val rows = d.collect(); collected.synchronized { collected ++= rows }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
    }
    collected.toSeq
  }

  /** Last emission per key, in collected order — the final state a
    * dashboard over an Update-mode stream displays. */
  private def lastPerKey[O, K](rows: Seq[O])(key: O => K): Map[K, O] =
    rows.foldLeft(Map.empty[K, O])((m, r) => m + (key(r) -> r))

  private val dir = "/root/testdata/sf0.001"

  test("transitionStream: restart mid-stream, transitions == uninterrupted run") {
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("ts"), col("event_type").as("eventType"))
      .orderBy("ts", "eventId")
    val rows = evs.as[TransEvent].collect()
    val mid = rows(rows.length / 2).ts
    val full = rows.toSeq.toDF()
    val h1 = rows.filter(e => !e.ts.after(mid)).toSeq.toDF()
    val h2 = rows.filter(e => e.ts.after(mid)).toSeq.toDF()
    val schema = "userId BIGINT, eventId BIGINT, ts TIMESTAMP, eventType STRING"
    def mk(df: DataFrame) = transitionStream(df.as[TransEvent])
    withRocksDB {
      val a = driveRuns(schema, Seq(full), mk)
      val b = driveRuns(schema, Seq(h1, h2), mk)
      // each adjacent pair extracted exactly once — a reset last-event
      // state would DROP the transition straddling the split
      assert(b.groupBy(identity).view.mapValues(_.size).toMap ==
        a.groupBy(identity).view.mapValues(_.size).toMap,
        "restart changed the extracted transition multiset")
    }
  }

  test("holtStream: restart mid-stream, level/trend recursion survives bit-for-bit") {
    val days = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type").as("eventType"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .agg(count(lit(1)).as("c"))
      .orderBy("epochDay", "eventType")
    val rows = days.as[DayCount].collect()
    val midDay = rows(rows.length / 2).epochDay
    val schema = "eventType STRING, epochDay BIGINT, c BIGINT"
    def mk(df: DataFrame) = holtStream(df.as[DayCount])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.epochDay <= midDay).toSeq.toDF(),
          rows.filter(_.epochDay > midDay).toSeq.toDF()), mk)
      // the recursion is order-1: losing (level, trend) at the split would
      // restart every post-split day from the "first day" branch
      assert(b.toSet == a.toSet, "restart diverged the Holt recursion")
      assert(b.size == a.size)
    }
  }

  test("medianStream: restart mid-stream, trailing-7 window state survives") {
    val days = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type").as("eventType"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .agg(count(lit(1)).as("c"))
      .orderBy("epochDay", "eventType")
    val rows = days.as[DayCount].collect()
    val midDay = rows(rows.length / 2).epochDay
    val schema = "eventType STRING, epochDay BIGINT, c BIGINT"
    def mk(df: DataFrame) = medianStream(df.as[DayCount])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.epochDay <= midDay).toSeq.toDF(),
          rows.filter(_.epochDay > midDay).toSeq.toDF()), mk)
      // the first 6 post-split days draw on pre-split counts — a lost
      // deque shows up as medians over too-short windows
      assert(b.toSet == a.toSet, "restart diverged the rolling median")
      assert(b.size == a.size)
    }
  }

  test("cmsStream: restart mid-stream, final sketch cells == uninterrupted sketch") {
    val toks = graft.Tables.load(spark, dir, "documents")
      .limit(60)
      .select(explode(split(col("text"), " ")).as("token"))
      .as[TokenObs].collect()
    val (h1, h2) = toks.splitAt(toks.length / 2)
    val schema = "token STRING"
    def mk(df: DataFrame) = cmsStream(df.as[TokenObs])
    withRocksDB {
      val a = driveRuns(schema, Seq(toks.toSeq.toDF()), mk)
      val b = driveRuns(schema, Seq(h1.toSeq.toDF(), h2.toSeq.toDF()), mk)
      // a reset cell counter restarts at the second half's increments —
      // final counts would undercount exactly the first half
      val finA = lastPerKey(a)(c => (c.j, c.b)).map { case (k, c) => k -> c.count }
      val finB = lastPerKey(b)(c => (c.j, c.b)).map { case (k, c) => k -> c.count }
      assert(finB == finA, "restart lost sketch counts")
    }
  }

  test("islandsStream: restart mid-stream, closed + live streaks == uninterrupted") {
    val days = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .distinct()
      .orderBy("epochDay", "userId")
    val rows = days.as[DayEvent].collect()
    val midDay = rows(rows.length / 2).epochDay
    val schema = "userId BIGINT, epochDay BIGINT"
    def mk(df: DataFrame) = islandsStream(df.as[DayEvent])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.epochDay <= midDay).toSeq.toDF(),
          rows.filter(_.epochDay > midDay).toSeq.toDF()), mk)
      // closed islands are emitted exactly once; a lost (start, last)
      // state re-opens a fresh streak at the split (wrong startDay) and
      // can never close the straddling island correctly
      val closedA = a.filter(_.closed).groupBy(identity).view.mapValues(_.size).toMap
      val closedB = b.filter(_.closed).groupBy(identity).view.mapValues(_.size).toMap
      assert(closedB == closedA, "restart changed the closed-streak multiset")
      val openA = lastPerKey(a.filter(!_.closed))(_.userId)
      val openB = lastPerKey(b.filter(!_.closed))(_.userId)
      assert(openB == openA, "restart changed the live streaks")
    }
  }

  test("lifecycleStream: restart mid-stream, classifications == uninterrupted run") {
    val weeks = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"),
        datediff(date_trunc("week", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("weekDay"))
      .distinct()
      .orderBy("weekDay", "userId")
    val rows = weeks.as[WeekEvent].collect()
    val midWk = rows(rows.length / 2).weekDay
    val schema = "userId BIGINT, weekDay BIGINT"
    def mk(df: DataFrame) = lifecycleStream(df.as[WeekEvent])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.weekDay <= midWk).toSeq.toDF(),
          rows.filter(_.weekDay > midWk).toSeq.toDF()), mk)
      // a lost last_week_day state would re-classify the first
      // post-restart week of every straddling user as "new" — the
      // classification multiset is the complete detector
      val byRun = Seq(a, b).map(_.groupBy(identity).view.mapValues(_.size).toMap)
      assert(byRun(1) == byRun(0), "restart changed the lifecycle classifications")
    }
  }

  test("lifecycleTimerStream: restart ACROSS a timer firing == uninterrupted run") {
    // the r10 timer twin: run B's leg-1 query registers event-time timers
    // (one per user at weekDay+14), stops on the checkpoint, and leg 2's
    // NEW query must recover both the value state AND the timer registry —
    // a lost timer would silently drop the flushed `churned` tail; a lost
    // latch would double-emit it.
    val weeks = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"),
        datediff(date_trunc("week", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("weekDay"))
      .distinct()
      .withColumn("ts", (col("weekDay") * 86400).cast("timestamp"))
      .orderBy("weekDay", "userId")
    val rows = weeks.as[TimedWeekEvent].collect()
    val midWk = rows(rows.length / 2).weekDay
    val maxWk = rows.map(_.weekDay).max
    val dayMs = 86400000L
    // sentinel (same in both runs): advances the watermark past EVERY
    // user's week+14 deadline; the trailing duplicate forces one more
    // microbatch so timers armed before it fire against that watermark
    val sentinel = TimedWeekEvent(-1L, maxWk + 70,
      new Timestamp((maxWk + 70) * dayMs))
    val schema = "userId BIGINT, weekDay BIGINT, ts TIMESTAMP"
    def mk(df: DataFrame) = lifecycleTimerStream(
      df.withWatermark("ts", "0 seconds").as[TimedWeekEvent])
    withRocksDB {
      val a = driveRuns(schema,
        Seq((rows.toSeq :+ sentinel).toDF(), Seq(sentinel).toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.weekDay <= midWk).toSeq.toDF(),
          (rows.filter(_.weekDay > midWk).toSeq :+ sentinel).toDF(),
          Seq(sentinel).toDF()), mk)
      val byRun = Seq(a, b).map(_.filter(_.userId != -1L)
        .groupBy(identity).view.mapValues(_.size).toMap)
      assert(byRun(0).valuesIterator.forall(_ == 1), "uninterrupted run double-emitted")
      assert(byRun(1) == byRun(0),
        "restart across a timer firing changed the lifecycle emissions")
      // the flushed tail must actually exist: with the watermark past every
      // deadline, every user's terminal week is churned exactly once
      val users = rows.map(_.userId).distinct.length
      assert(byRun(0).keysIterator.count(_.state == "churned") >=  users,
        "timer flush missing: every user's terminal week must churn")
    }
  }

  test("pageHinkleyStream: restart mid-stream, excursions == uninterrupted run") {
    // a lost (t, s, ph, runmin) quadruple would restart the prefix mean at
    // the split and shift every post-restart excursion — the emission
    // multiset is the complete detector
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type").as("eventType"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .agg(count(lit(1)).as("c"))
      .orderBy("epochDay", "eventType")
    val rows = daily.as[DayCount].collect()
    val midDay = rows(rows.length / 2).epochDay
    val schema = "eventType STRING, epochDay BIGINT, c BIGINT"
    def mk(df: DataFrame) = pageHinkleyStream(df.as[DayCount])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.epochDay <= midDay).toSeq.toDF(),
          rows.filter(_.epochDay > midDay).toSeq.toDF()), mk)
      val byRun = Seq(a, b).map(_.groupBy(identity).view.mapValues(_.size).toMap)
      assert(byRun(0).valuesIterator.forall(_ == 1), "duplicate PH emission")
      assert(byRun(1) == byRun(0), "restart changed the PH excursions")
    }
  }

  test("stickinessStream: restart mid-stream, returning flags == uninterrupted run") {
    // a lost last_day would mark the first post-restart day of every
    // straddling user as non-returning — the emission multiset detects it
    val days = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").as("userId"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("epochDay"))
      .distinct()
      .orderBy("epochDay", "userId")
    val rows = days.as[DayEvent].collect()
    val midDay = rows(rows.length / 2).epochDay
    val schema = "userId BIGINT, epochDay BIGINT"
    def mk(df: DataFrame) = stickinessStream(df.as[DayEvent])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.epochDay <= midDay).toSeq.toDF(),
          rows.filter(_.epochDay > midDay).toSeq.toDF()), mk)
      val byRun = Seq(a, b).map(_.groupBy(identity).view.mapValues(_.size).toMap)
      assert(byRun(0).valuesIterator.forall(_ == 1), "duplicate stickiness emission")
      assert(byRun(1) == byRun(0), "restart changed the returning flags")
    }
  }

  test("packStream: restart mid-stream, final pack accounting == uninterrupted") {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id").as("docId"),
        size(split(col("text"), " ")).cast("long").as("nTokens"))
      .orderBy("docId")
    val rows = docs.as[PackDoc].collect()
    val midId = rows(rows.length / 2).docId
    val schema = "source STRING, docId BIGINT, nTokens BIGINT"
    def mk(df: DataFrame) = packStream(df.as[PackDoc])
    withRocksDB {
      val a = driveRuns(schema, Seq(rows.toSeq.toDF()), mk)
      val b = driveRuns(schema,
        Seq(rows.filter(_.docId <= midId).toSeq.toDF(),
          rows.filter(_.docId > midId).toSeq.toDF()), mk)
      // lost (docs, tokens) totals restart a block's accounting at the
      // split — n_docs/n_tokens undercount, padding recomputes wrong
      val finA = lastPerKey(a)(p => (p.source, p.blk))
      val finB = lastPerKey(b)(p => (p.source, p.blk))
      assert(finB == finA, "restart lost packer accounting")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.BucketPriorityConfig
import graft.sql.BucketRouting
import graft.streaming.PriorityStreams

/** Routing-throughput measurement: the reference's hot path is one O(1)
  * partition() call per record on a Kafka client thread; this engine's
  * equivalent is routeUniform inside a micro-batch. Reports routed
  * events/second for (a) a large batch and (b) a rate-source stream.
  *
  * Run: sbt "runMain graft.StreamBench"   (prints one JSON line)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = BucketPriorityConfig("events",
      Seq("purchase", "signup", "error", "click"), Seq(40, 30, 20, 10)).toOption.get

    // one key scheme for all three workloads (batch, stream, routed write):
    // 4 routable event types + unroutable "view", each exactly 1/5 of ids
    def keyedFrom(id: org.apache.spark.sql.Column) = concat(
      element_at(
        array(lit("purchase"), lit("signup"), lit("error"), lit("click"), lit("view")),
        (pmod(id, lit(5)) + 1).cast("int")),
      lit("-"), id).as("key")

    // ---- batch: 20M synthetic keyed rows through routeUniform ----
    val rows = 20_000_000L
    val batch = spark.range(rows).select(keyedFrom(col("id")))
    batch.count() // materialize the input plan once (warm)
    val t0 = System.nanoTime()
    val routedCount = BucketRouting.discard(
      BucketRouting.routeUniform(batch, cfg, 10, col("key"))).count()
    val batchSecs = (System.nanoTime() - t0) / 1e9
    val batchRps = routedCount / batchSecs

    // A/B: the same routing as a first-class physical operator
    // (AssignPartitionsExec over UnsafeRows — no Row encoder round-trip)
    val n0 = System.nanoTime()
    val nativeCount = BucketRouting.discard(
      BucketRouting.routeUniformNative(batch, cfg, 10, col("key"))).count()
    val nativeSecs = (System.nanoTime() - n0) / 1e9
    val nativeRps = nativeCount / nativeSecs
    assert(nativeCount == routedCount,
      s"native router count $nativeCount != mapPartitions $routedCount")

    // ---- streaming: rate source through routeStream ----
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "2000000")
      .option("numPartitions", cpus).load()
    val keyed = rate.select(keyedFrom(col("value")))
    val routed = PriorityStreams.routeStream(keyed, cfg, 10, col("key"), discardUnroutable = true)
    @volatile var streamed = 0L
    val q = routed.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        streamed += b.count(); ()
      }
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val s0 = System.nanoTime()
    Thread.sleep(15000)
    q.stop()
    val streamSecs = (System.nanoTime() - s0) / 1e9
    val streamRps = streamed / streamSecs

    // ---- routed write e2e: route -> partitioned parquet sink ----
    // The file-system twin of the Kafka partitioned-topic write (toKafkaFrame
    // carries `partition`; a file sink expresses the same layout as pt=N
    // directories). Timed end-to-end, then the per-partition counts are
    // checked against bucket_layout proportions — each of the 4 routable
    // event types is exactly 1/5 of the input, so bucket b's rows must land
    // ONLY in b's partitions, evenly (routeUniform round-robin, skew ≤ tasks).
    val writeRows = 5_000_000L
    val writeIn = spark.range(writeRows).select(keyedFrom(col("id")))
    val sink = java.nio.file.Files.createTempDirectory("graft-routed-sink").toString
    val w0 = System.nanoTime()
    BucketRouting.discard(BucketRouting.routeUniform(writeIn, cfg, 10, col("key")))
      .write.mode("overwrite").partitionBy("pt").parquet(sink)
    val writeSecs = (System.nanoTime() - w0) / 1e9
    val written = writeRows / 5 * 4 // "view" is unroutable and discarded
    val writeRps = written / writeSecs
    val counts = spark.read.parquet(sink).groupBy("pt").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val lay = graft.core.BucketLayout.layout(cfg, 10).toMap
    val inTasks = spark.sparkContext.defaultParallelism
    cfg.buckets.foreach { b =>
      val parts = lay(b)
      // getOrElse: an empty partition must fail the layout ASSERT below
      // (the regression this check exists for), not a map lookup
      val perPart = parts.map(p => counts.getOrElse(p, 0L))
      assert(perPart.sum == writeRows / 5, s"$b total ${perPart.sum} != ${writeRows / 5}")
      val expected = writeRows / 5.0 / parts.size
      perPart.foreach(c => assert(math.abs(c - expected) <= inTasks,
        s"$b per-partition counts $perPart drifted from $expected (> $inTasks)"))
    }

    println(f"""{"metric":"route_throughput","batch_rows_per_sec":$batchRps%.0f,"native_exec_rows_per_sec":$nativeRps%.0f,"stream_rows_per_sec":$streamRps%.0f,"batch_rows":$routedCount,"stream_rows":$streamed,"routed_write_rows_per_sec":$writeRps%.0f,"routed_write_rows":$written,"layout_check":"pass"}""")
    spark.stop()
  }
}

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

    // ---- batch: 20M synthetic keyed rows through routeUniform ----
    val rows = 20_000_000L
    val batch = spark.range(rows).select(
      concat(
        element_at(
          array(lit("purchase"), lit("signup"), lit("error"), lit("click"), lit("view")),
          (pmod(col("id"), lit(5)) + 1).cast("int")),
        lit("-"), col("id")).as("key"))
    batch.count() // materialize the input plan once (warm)
    val t0 = System.nanoTime()
    val routedCount = BucketRouting.discard(
      BucketRouting.routeUniform(batch, cfg, 10, col("key"))).count()
    val batchSecs = (System.nanoTime() - t0) / 1e9
    val batchRps = routedCount / batchSecs

    // ---- streaming: rate source through routeStream ----
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "2000000")
      .option("numPartitions", cpus).load()
    val keyed = rate.select(concat(
      element_at(
        array(lit("purchase"), lit("signup"), lit("error"), lit("click"), lit("view")),
        (pmod(col("value"), lit(5)) + 1).cast("int")),
      lit("-"), col("value")).as("key"))
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

    println(f"""{"metric":"route_throughput","batch_rows_per_sec":$batchRps%.0f,"stream_rows_per_sec":$streamRps%.0f,"batch_rows":$routedCount,"stream_rows":$streamed}""")
    spark.stop()
  }
}

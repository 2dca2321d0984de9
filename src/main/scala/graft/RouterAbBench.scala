package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.BucketPriorityConfig
import graft.sql.BucketRouting

/** Dev microbench for the two batch routers (r12): the quiet StreamBench
  * rerun read the native AssignPartitionsExec leg at 934k rows/s vs r11's
  * 12.6M — 13x — while the mapPartitions leg moved only ~1.5x (box
  * slowdown). Both legs are SINGLE-SHOT in StreamBench, so a first-run
  * JIT/codegen stall is indistinguishable from a regression there. This
  * main runs each router 3x over the same 20M-row input (min matters).
  * Usage: sbt "runMain graft.RouterAbBench"
  */
object RouterAbBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-router-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = BucketPriorityConfig("events",
      Seq("purchase", "signup", "error", "click"), Seq(40, 30, 20, 10)).toOption.get
    def keyedFrom(id: org.apache.spark.sql.Column) = concat(
      element_at(
        array(lit("purchase"), lit("signup"), lit("error"), lit("click"), lit("view")),
        (pmod(id, lit(5)) + 1).cast("int")),
      lit("-"), id).as("key")
    val rows = 20_000_000L
    val batch = spark.range(rows).select(keyedFrom(col("id")))
    batch.count() // warm the input plan
    def leg(tag: String)(body: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[router-ab] $tag run$i: ${n / s / 1e6}%.1f M rows/s ($s%.1f s)")
      }
    leg("mapPartitions") {
      BucketRouting.discard(BucketRouting.routeUniform(batch, cfg, 10, col("key"))).count()
    }
    leg("native") {
      BucketRouting.discard(BucketRouting.routeUniformNative(batch, cfg, 10, col("key"))).count()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Regression guard for the r11 doubly-exponential checkpoint-stats blow-up.
  *
  * `Dataset.localCheckpoint` preserves the origin plan's Statistics on the
  * resulting LogicalRDD; in an iterative join→agg→checkpoint loop the
  * inherited estimates multiply each round and the BigInt sizes grow
  * doubly-exponentially until Catalyst spends minutes per planning pass in
  * BigInteger multiplication (observed live on the sf1 band-local cluster
  * leg). [[org.apache.spark.sql.graftbridge.Bridge.capRddStats]] (applied
  * inside [[graft.queries.Q.truncate]]) clamps every checkpointed leaf's
  * estimate, keeping round estimates bounded forever.
  */
class CheckpointStatsSpec extends SparkTestBase {

  test("iterative checkpoint loop keeps size estimates bounded") {
    val cap = BigInt("1000000000000000")
    var df = spark.range(200)
      .select(col("id").as("src"), ((col("id") + 1) % 200).as("dst"))
      .localCheckpoint(true)
    df = org.apache.spark.sql.graftbridge.Bridge.capRddStats(df)
    (1 to 18).foreach { round =>
      val step = df.as("a").join(df.as("b"), col("a.dst") === col("b.src"))
        .groupBy(col("a.src").as("src")).agg(min(col("b.dst")).as("dst"))
      val t0 = System.nanoTime()
      df = org.apache.spark.sql.graftbridge.Bridge.capRddStats(
        step.localCheckpoint(true))
      val secs = (System.nanoTime() - t0) / 1e9
      val leafStats = df.queryExecution.analyzed.stats.sizeInBytes
      assert(leafStats <= cap,
        s"round $round: checkpointed leaf estimate $leafStats exceeds the cap")
      // uncapped, round ~14 takes MINUTES; capped, every round is sub-second
      // planning (generous bound absorbs CI noise / job time on 200 rows)
      assert(secs < 30.0, s"round $round took ${secs}s — stats blow-up is back")
    }
  }
}

package graft.examples

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16): does an eager localCheckpoint()/checkpoint() action
  * deliver Observation metrics? The CC-loop optimization piggybacks the
  * convergence label-sum onto the per-round checkpoint job — this probe
  * pins the mechanism before the loop relies on it. Prints one line per
  * case; exits nonzero on a mismatch. */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // non-empty frame through localCheckpoint
    val obs1 = Observation("p1")
    val df1 = spark.range(0, 1000).toDF("id")
      .groupBy(($"id" % 7).as("k")).agg(sum($"id").cast("decimal(28,0)").as("label"))
      .observe(obs1, sum($"label".cast("decimal(28,0)")).as("s"))
    df1.localCheckpoint(true)
    val got1 = obs1.get("s")
    println(s"[probe] localCheckpoint sum=$got1 (expect 499500)")

    // empty frame: sum over zero rows must come back null, not hang
    val obs2 = Observation("p2")
    val df2 = spark.range(0, 10).toDF("id").filter($"id" < 0)
      .observe(obs2, sum($"id".cast("decimal(28,0)")).as("s"))
    df2.localCheckpoint(true)
    val got2 = obs2.get("s")
    println(s"[probe] empty localCheckpoint sum=$got2 (expect null)")

    // reliable checkpoint path (what Q.truncate uses when a checkpoint
    // dir is configured — the cluster mode): must deliver metrics too,
    // else obs.get would hang the loop on a real cluster
    val ckDir = java.nio.file.Files.createTempDirectory("obsprobe").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    val obs3 = Observation("p3")
    val df3 = spark.range(0, 100).toDF("id")
      .observe(obs3, sum($"id".cast("decimal(28,0)")).as("s"))
    df3.checkpoint(true)
    val got3 = obs3.get("s")
    println(s"[probe] reliable checkpoint sum=$got3 (expect 4950)")

    val ok = got1 != null && got1.toString == "499500" && got2 == null &&
      got3 != null && got3.toString == "4950"
    println(s"[probe] ok=$ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

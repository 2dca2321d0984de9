package graft

import org.apache.spark.sql.SparkSession

/** Builder-side diagnostic: attribute `DAGScheduler: Broadcasting large task
  * binary` warnings to the query that triggered them. Runs every registry
  * query at the given SF with a stderr marker before each, so the log4j WARN
  * lines (also on stderr) interleave with the query names. Task-binary size
  * is a property of the PLAN/closure, not the data, so sf0.001 suffices.
  *
  * Usage: runMain graft.BinProbe <sfDir> [queryName...]
  */
object BinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        System.err.println(s"[binprobe] >>> $name")
        System.err.flush()
        try { fn(spark, sfDir).collect(); () }
        catch { case e: Throwable =>
          System.err.println(s"[binprobe] $name FAILED: ${e.getMessage}")
        }
      }
    System.err.println("[binprobe] done")
    spark.stop()
  }
}

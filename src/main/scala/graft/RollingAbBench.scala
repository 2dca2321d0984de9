package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B for dedup_substrings' gram hash (r10, verdict item 3): the r9
  * md5-of-a-joined-50-token-slice per position vs [[graft.functions
  * .RollingWindowHashes]] — the full query body downstream of the gram
  * frame is identical, so the delta IS the hot loop. 3 warm runs each.
  * Usage: sbt "runMain graft.RollingAbBench [sfDir]" */
object RollingAbBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, dir, "documents").count() // warm the scan cache

    def base = Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 50)

    val md5Grams: DataFrame = base
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1, size(toks) - 49)")).as("p"), col("toks"))
      .select(col("doc_id"), col("source"), col("p").cast("long").as("p"),
        expr("md5(array_join(slice(toks, int(p), 50), ' '))").as("gh"))

    val rollGrams: DataFrame = base
      .select(col("doc_id"), col("source"),
        posexplode(graft.functions.WindowMd5Functions
          .rollingWindowHashes(col("toks"), 50)))
      .select(col("doc_id"), col("source"),
        (col("pos") + 1).cast("long").as("p"), col("col").as("gh"))

    def full(grams: DataFrame): DataFrame = {
      val dup = grams.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("gh")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("p"))
      val spans = grams.join(dup, Seq("gh"))
        .select("doc_id", "source", "p")
        .withColumn("grp", col("p") - row_number().over(w))
        .groupBy(col("doc_id"), col("source"), col("grp"))
        .agg(min(col("p")).as("a"), max(col("p")).as("b"))
        .withColumn("span_tokens", col("b") - col("a") + lit(50L))
      spans.groupBy("source")
        .agg(count(lit(1)).as("n_spans"),
          countDistinct(col("doc_id")).as("n_docs_affected"),
          sum(col("span_tokens")).as("dup_tokens"),
          max(col("span_tokens")).as("max_span_tokens"))
        .orderBy("source")
    }

    for ((name, grams) <- Seq("md5" -> md5Grams, "rolling" -> rollGrams); i <- 1 to 3) {
      val t0 = System.nanoTime()
      full(grams).queryExecution.toRdd.count()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"dedup_substrings[$name] run$i: $ms%.0f ms  ($dir)")
    }
    spark.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** §2.2 sources/sinks beyond parquet: CSV, JSON, ORC round-trips preserve
  * the data the engine computes on. */
class SourcesSpec extends SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString
  private lazy val sample = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_orderkey", "l_quantity", "l_returnflag")
    .limit(1000).cache()

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
    val r = df.agg(count(lit(1)), sum("l_quantity")).collect()(0)
    (r.getLong(0), r.getDouble(1))
  }

  test("csv round-trip") {
    sample.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(s"$tmp/csv")
    assert(checksum(back) == checksum(sample))
  }

  test("json round-trip") {
    sample.write.mode("overwrite").json(s"$tmp/json")
    val back = spark.read.schema(sample.schema).json(s"$tmp/json")
    assert(checksum(back) == checksum(sample))
  }

  test("orc round-trip") {
    sample.write.mode("overwrite").orc(s"$tmp/orc")
    val back = spark.read.orc(s"$tmp/orc")
    assert(checksum(back) == checksum(sample))
  }

  test("corrupt JSON records are captured, not dropped (PERMISSIVE ingestion)") {
    // real-ingestion posture: malformed lines land in _corrupt_record for
    // quarantine instead of silently vanishing (or failing the whole job)
    val dir = s"$tmp/corrupt"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.json"),
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "another good row"}
        |not json at all
        |""".stripMargin)
    val schema = "doc_id BIGINT, text STRING, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache() // cache: corrupt-record access requires materialization
    try {
      assert(df.count() == 4)
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2)
      assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      assert(bad.count() == 2) // the quarantine set, raw text preserved
      assert(bad.select("_corrupt_record").collect().forall(!_.isNullAt(0)))
    } finally df.unpersist()
  }

  test("observe(): pipeline metrics collected during the pass, no second job") {
    // the Observation API gives a curation pipeline its telemetry (rows
    // seen, quality mass, gate pass counts) from the SAME pass that
    // produces the output — at 100 TB a separate metrics job doubles cost
    val obs = new org.apache.spark.sql.Observation("curation-metrics")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("n_toks", size(split(col("text"), " ")))
      .observe(obs,
        count(lit(1)).as("docs_seen"),
        sum(when(col("n_toks") >= 20, 1).otherwise(0)).as("passed_gate"),
        sum("n_chars").as("chars_total"))
    val kept = docs.filter(col("n_toks") >= 20)
    val keptCount = kept.count() // one action drives output AND metrics
    val m = obs.get
    val totalDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(m("docs_seen").asInstanceOf[Long] == totalDocs)
    assert(m("passed_gate").asInstanceOf[Long] == keptCount)
    val charsTotal = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .agg(sum("n_chars")).head().getLong(0)
    assert(m("chars_total").asInstanceOf[Long] == charsTotal)
  }

  test("partitioned parquet write prunes partitions on read") {
    sample.write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$tmp/part")
    val pruned = spark.read.parquet(s"$tmp/part").filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(checksum(pruned.drop("l_returnflag"))._1 ==
      sample.filter(col("l_returnflag") === "R").count())
    // partition filter must be applied at scan, not as a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter"))
  }
}

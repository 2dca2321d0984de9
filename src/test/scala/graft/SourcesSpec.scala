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

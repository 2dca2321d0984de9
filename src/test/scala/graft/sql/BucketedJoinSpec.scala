package graft.sql

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Bucketing = the co-located-join story at 100 TB: both fact tables are
  * written pre-hashed into the same number of buckets on the join key, so
  * the sort-merge join needs NO shuffle exchange at read time. */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed saveAsTable -> join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle either side:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.agg(sum("qty")).collect()(0).getDouble(0)
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum("l_quantity")).collect()(0).getDouble(0)
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

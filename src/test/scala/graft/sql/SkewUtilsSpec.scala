package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewUtilsSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that pins a single reducer
  private def skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"key${i % 100}" else "HOT", i.toLong)
  }.toDF("k", "v")

  private def dim = Seq(("HOT", "hot-meta"), ("key10", "k10-meta"), ("key20", "k20-meta"))
    .toDF("k", "meta")

  test("saltedJoin result equals the plain join") {
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "meta").count()
    val salted = SkewUtils.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("k", "meta").count()
    val p = plain.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val s = salted.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(s == p)
    // and the physical join key really is (k, salt): hot rows spread across reducers
    val plan = SkewUtils.saltedJoin(skewed, dim, "k", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"))
  }

  test("saltedAgg(sum) equals plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewUtils.saltedAgg(skewed, "k", salts = 8,
        partial = sum, merge = sum, valueCol = "v", resultName = "total")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}

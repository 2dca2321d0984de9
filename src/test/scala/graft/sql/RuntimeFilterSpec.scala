package graft.sql

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Spark's runtime bloom-filter injection (InjectRuntimeFilter) on this
  * engine's fact⋈filtered-dim shapes — the row-level semi-join pushdown a
  * 100 TB deployment leans on when the dim side is selective but too big to
  * broadcast: the filtered dim's keys are folded into a bloom filter
  * (scalar subquery) and `might_contain(xxhash64(key))` is applied AT THE
  * FACT SCAN, so most fact rows die before the shuffle.
  *
  * Local test data sits below the size thresholds, so the spec lowers them
  * to make the optimization fire — asserting (a) the rewrite applies to our
  * join shape and (b) results are unchanged by it. Production keeps the
  * default thresholds: the same plans qualify exactly when the sizes make
  * it worthwhile.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def withRuntimeFilter[T](body: => T): T = withConfs(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force a real shuffle join
  )(body)

  private def factJoin = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
  }

  test("runtime bloom filter is injected at the fact scan of a selective shuffle join") {
    withRuntimeFilter {
      val optimized = factJoin.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected might_contain on the fact side:\n${optimized.take(2000)}")
      assert(optimized.contains("bloom_filter_agg"),
        s"expected bloom_filter_agg over the filtered dim keys:\n${optimized.take(2000)}")
    }
  }

  test("runtime-filtered join returns identical results") {
    val expected = factJoin.count() // default config (no runtime filter at this size)
    val got = withRuntimeFilter(factJoin.count())
    assert(got == expected, s"runtime filter changed the result: $got != $expected")
    assert(expected > 0)
  }
}

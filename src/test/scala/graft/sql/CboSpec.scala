package graft.sql

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

import graft.{SparkTestBase, Tables}

/** Statistics-driven planning: ANALYZE TABLE + the cost-based optimizer's
  * join reordering — how a 100 TB engine avoids executing a query in the
  * order a human happened to write it. The query text joins
  * lineitem⋈orders FIRST and the tiny filtered customer side LAST; with
  * column statistics and CBO on, Catalyst reorders to build the selective
  * orders⋈customer pair first so the fact table joins against a reduced
  * side. Without CBO the textual order stands — both asserted.
  */
class CboSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private val sql =
    """SELECT c_name, SUM(l_quantity) AS qty FROM cbo_li
      |JOIN cbo_ord ON l_orderkey = o_orderkey
      |JOIN cbo_cust ON o_custkey = c_custkey AND c_custkey < 50
      |GROUP BY c_name""".stripMargin

  /** Table names of the two sides of the BOTTOM-most join in the plan. */
  private def innermostJoinTables(plan: LogicalPlan): Set[String] = {
    val bottom = plan.collect { case j: Join => j }.last
    bottom.collectLeaves().flatMap { leaf =>
      "cbo_(li|ord|cust)".r.findFirstIn(leaf.toString)
    }.toSet
  }

  test("ANALYZE + CBO reorders the join; without CBO the textual order stands") {
    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      Tables.load(spark, dir, "lineitem").write.mode("overwrite").saveAsTable("cbo_li")
      Tables.load(spark, dir, "orders").write.mode("overwrite").saveAsTable("cbo_ord")
      Tables.load(spark, dir, "customer").write.mode("overwrite").saveAsTable("cbo_cust")
      Seq("cbo_li", "cbo_ord", "cbo_cust").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val textualOrder = innermostJoinTables(spark.sql(sql).queryExecution.optimizedPlan)
      assert(textualOrder == Set("cbo_li", "cbo_ord"),
        s"without CBO the innermost join should follow the text: $textualOrder")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val cboOrder = innermostJoinTables(spark.sql(sql).queryExecution.optimizedPlan)
      assert(cboOrder == Set("cbo_ord", "cbo_cust"),
        s"CBO should build the selective orders x customer pair first: $cboOrder")

      // and the reorder is only a plan change, never a result change
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = spark.sql(sql).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = spark.sql(sql).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(withCbo == without && without.nonEmpty)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      Seq("cbo_li", "cbo_ord", "cbo_cust").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}

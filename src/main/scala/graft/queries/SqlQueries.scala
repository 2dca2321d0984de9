package graft.queries

import graft.Tables

/** Queries expressed once in the common ANSI subset both engines parse: the
  * Spark side runs the IDENTICAL text through `spark.sql` (entry point §3
  * EP-SQL), the oracle runs it in DuckDB — so these rows also pin the SQL
  * front-end, not just the DataFrame DSL.
  *
  * Float discipline as everywhere: exact-decimal sums, exact-int division,
  * no libm functions.
  */
object SqlQueries {

  private def sqlQ(sql: String): Q =
    Q(fn = (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, oracle = Some(sql))

  val all: Map[String, Q] = Map(

    // correlated scalar subquery: customers above their nation's mean balance
    "q_scalar_subquery" -> sqlQ(
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin),

    // uncorrelated IN subquery
    "q_in_subquery" -> sqlQ(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin),

    // NOT IN with a guaranteed-non-null subquery (three-valued-logic corner)
    "q_not_in_subquery" -> sqlQ(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |ORDER BY s_suppkey""".stripMargin),

    // advanced window functions: ntile / percent_rank / cume_dist / first / nth
    "q_window_advanced" -> sqlQ(
      """SELECT c_mktsegment, c_custkey,
        |       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |       PERCENT_RANK() OVER w AS pr,
        |       CUME_DIST() OVER w AS cd,
        |       FIRST_VALUE(c_custkey) OVER wf AS top_cust,
        |       NTH_VALUE(c_custkey, 2) OVER wf AS second_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
        |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin),

    // exact median over integral-valued doubles (even-count mean is exact)
    "q_median" -> sqlQ(
      """SELECT l_returnflag, MEDIAN(l_quantity) AS med_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // HAVING
    "q_having" -> sqlQ(
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin),

    // LIMIT / OFFSET pagination over a total order
    "q_limit_offset" -> sqlQ(
      """SELECT p_partkey, p_name FROM part
        |ORDER BY p_partkey LIMIT 20 OFFSET 40""".stripMargin),

    // CTE + UNION ALL in the common subset
    "q_cte_union" -> sqlQ(
      """WITH big AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders WHERE o_totalprice > 300000 GROUP BY 1),
        |     any_o AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1)
        |SELECT 'big' AS tag, COUNT(*) AS n_custs FROM big
        |UNION ALL
        |SELECT 'any' AS tag, COUNT(*) AS n_custs FROM any_o
        |ORDER BY tag""".stripMargin)
  )
}

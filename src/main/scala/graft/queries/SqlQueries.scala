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

  /** cusum_drift's Spark-dialect SQL. The recursion body is JOIN-FREE:
    * each type's sorted (day, count) series rides INSIDE the recursion row
    * as two arrays indexed by position — the q_recursive_calendar
    * carry-the-bound trick generalized to carry the DATA. A measured
    * necessity, not a style choice: a loop body that joins the grid costs
    * ~0.25 s of driver floor per iteration in Spark's UnionLoop even when
    * the grid is a 150-row cached in-memory table (30 iterations = 7.6 s);
    * the join-free projection body runs the same 30 iterations in well
    * under a second. Arrays are calendar-bounded (~30 × 12 bytes per
    * type), so carrying them is free. */
  private val CusumSparkSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |packed AS (
      |  SELECT event_type,
      |         transform(sort_array(collect_list(struct(d, c))), x -> x.d) AS days,
      |         transform(sort_array(collect_list(struct(d, c))), x -> x.c) AS cs,
      |         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sa
      |  FROM daily GROUP BY event_type),
      |cus(event_type, days, cs, n, sa, i, s, e) AS (
      |  SELECT event_type, days, cs, n, sa, CAST(1 AS BIGINT),
      |         CASE WHEN n * element_at(cs, 1) - sa > 0
      |              THEN n * element_at(cs, 1) - sa ELSE CAST(0 AS BIGINT) END,
      |         CAST(element_at(cs, 1) AS DOUBLE)
      |  FROM packed
      |  UNION ALL
      |  SELECT event_type, days, cs, n, sa, i + 1,
      |         CASE WHEN s + n * element_at(cs, CAST(i + 1 AS INT)) - sa > 0
      |              THEN s + n * element_at(cs, CAST(i + 1 AS INT)) - sa
      |              ELSE CAST(0 AS BIGINT) END,
      |         (CAST(element_at(cs, CAST(i + 1 AS INT)) AS DOUBLE) + e) / 2
      |  FROM cus WHERE i < n)
      |SELECT event_type, element_at(days, CAST(i AS INT)) AS d,
      |       element_at(cs, CAST(i AS INT)) AS c, s AS cusum_scaled,
      |       s > 3 * sa AS drift_alarm, e AS ema_halflife1
      |FROM cus ORDER BY event_type, d""".stripMargin

  /** The same recursion in DuckDB's dialect (1-based list indexing,
    * ORDER BY inside list()); the arithmetic is verbatim identical. */
  private val CusumDuckSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |packed AS (
      |  SELECT event_type,
      |         list(d ORDER BY d) AS days,
      |         list(c ORDER BY d) AS cs,
      |         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sa
      |  FROM daily GROUP BY event_type),
      |cus(event_type, days, cs, n, sa, i, s, e) AS (
      |  SELECT event_type, days, cs, n, sa, CAST(1 AS BIGINT),
      |         CASE WHEN n * cs[1] - sa > 0
      |              THEN n * cs[1] - sa ELSE CAST(0 AS BIGINT) END,
      |         CAST(cs[1] AS DOUBLE)
      |  FROM packed
      |  UNION ALL
      |  SELECT event_type, days, cs, n, sa, i + 1,
      |         CASE WHEN s + n * cs[CAST(i + 1 AS INTEGER)] - sa > 0
      |              THEN s + n * cs[CAST(i + 1 AS INTEGER)] - sa
      |              ELSE CAST(0 AS BIGINT) END,
      |         (CAST(cs[CAST(i + 1 AS INTEGER)] AS DOUBLE) + e) / 2
      |  FROM cus WHERE i < n)
      |SELECT event_type, days[CAST(i AS INTEGER)] AS d,
      |       cs[CAST(i AS INTEGER)] AS c, s AS cusum_scaled,
      |       s > 3 * sa AS drift_alarm, e AS ema_halflife1
      |FROM cus ORDER BY event_type, d""".stripMargin

  /** Holt double-exponential smoothing (α = β = ½) over each event type's
    * daily-volume series — cusum_drift's EMA tracks LEVEL only and lags a
    * trending series by construction; Holt adds the trend state, giving the
    * dashboard-standard smoothed level + slope and a one-step-ahead
    * forecast residual (the volume-anomaly signal daily_anomalies' static
    * 3σ rule can't produce for trending types). Float doctrine: the
    * recurrence is a FIXED chain of correctly-rounded IEEE add/divide ops
    * — `((c + l) + b) / 2` spelled with identical parenthesization in both
    * dialects (neither engine reassociates fp arithmetic), the cusum EMA
    * precedent extended to two state variables. The trend update
    * b' = (b + (l' − l))/2 inlines l' as the identical sub-expression so
    * both engines evaluate the same op DAG. Scale shape: identical to
    * cusum_drift — one day-grain hash agg, per-type packed arrays bounded
    * by the calendar span, recursion depth = day span.
    */
  private val HoltSparkSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |packed AS (
      |  SELECT event_type,
      |         transform(sort_array(collect_list(struct(d, c))), x -> x.d) AS days,
      |         transform(sort_array(collect_list(struct(d, c))), x -> x.c) AS cs,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM daily GROUP BY event_type),
      |h(event_type, days, cs, n, i, l, b, r) AS (
      |  SELECT event_type, days, cs, n, CAST(1 AS BIGINT),
      |         CAST(element_at(cs, 1) AS DOUBLE), CAST(0 AS DOUBLE),
      |         CAST(NULL AS DOUBLE)
      |  FROM packed
      |  UNION ALL
      |  SELECT event_type, days, cs, n, i + 1,
      |         ((CAST(element_at(cs, CAST(i + 1 AS INT)) AS DOUBLE) + l) + b) / 2,
      |         (b + (((CAST(element_at(cs, CAST(i + 1 AS INT)) AS DOUBLE) + l) + b) / 2 - l)) / 2,
      |         CAST(element_at(cs, CAST(i + 1 AS INT)) AS DOUBLE) - (l + b)
      |  FROM h WHERE i < n)
      |SELECT event_type, element_at(days, CAST(i AS INT)) AS d,
      |       element_at(cs, CAST(i AS INT)) AS c,
      |       l AS level, b AS trend, r AS resid
      |FROM h ORDER BY event_type, d""".stripMargin

  /** The same recursion in DuckDB's dialect; arithmetic verbatim. */
  private val HoltDuckSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |packed AS (
      |  SELECT event_type,
      |         list(d ORDER BY d) AS days,
      |         list(c ORDER BY d) AS cs,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM daily GROUP BY event_type),
      |h(event_type, days, cs, n, i, l, b, r) AS (
      |  SELECT event_type, days, cs, n, CAST(1 AS BIGINT),
      |         CAST(cs[1] AS DOUBLE), CAST(0 AS DOUBLE),
      |         CAST(NULL AS DOUBLE)
      |  FROM packed
      |  UNION ALL
      |  SELECT event_type, days, cs, n, i + 1,
      |         ((CAST(cs[CAST(i + 1 AS INTEGER)] AS DOUBLE) + l) + b) / 2,
      |         (b + (((CAST(cs[CAST(i + 1 AS INTEGER)] AS DOUBLE) + l) + b) / 2 - l)) / 2,
      |         CAST(cs[CAST(i + 1 AS INTEGER)] AS DOUBLE) - (l + b)
      |  FROM h WHERE i < n)
      |SELECT event_type, days[CAST(i AS INTEGER)] AS d,
      |       cs[CAST(i AS INTEGER)] AS c,
      |       l AS level, b AS trend, r AS resid
      |FROM h ORDER BY event_type, d""".stripMargin

  val all: Map[String, Q] = Map(

    "holt_smooth" -> Q(
      fn = (s, dir) => { Tables.registerAll(s, dir); s.sql(HoltSparkSql) },
      oracle = Some(HoltDuckSql)),

    // FILTER (WHERE …) aggregate clause (added r6) — one pass computing
    // conditional aggregates without CASE scaffolding; identical text on
    // both engines pins the SQL front-end's FILTER support. Money sum
    // through exact DECIMAL, output as correctly-rounded DOUBLE.
    "q_filter_clause" -> sqlQ(
      """SELECT l_returnflag,
        |       COUNT(*) AS n_rows,
        |       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_highdisc,
        |       COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // WITH RECURSIVE (added r7) — the calendar-series generator, identical
    // text on both engines: Spark 4.x's recursive CTE (UnionLoop) pinned
    // against DuckDB's on a real shape — generate the full day grid between
    // the corpus's first and last event and LEFT JOIN a sparse slice's
    // daily volumes (purchases by the first three users: ~2/day, so real
    // zero-traffic days exist at every sf), surfacing the days a plain
    // GROUP BY silently omits as is_gap rows. Recursion depth = the
    // calendar span (30 here), far under either engine's recursion limit;
    // all arithmetic integer-exact. The upper bound rides INSIDE the
    // recursion rows (anchor selects both d0 and d1): a scalar subquery on
    // `bounds` in the loop body would re-run the corpus min/max agg every
    // iteration (measured 6.5 s → 0.6 s at sf0.1).
    "q_recursive_calendar" -> sqlQ(
      """WITH RECURSIVE bounds AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
        |),
        |cal(d, d1) AS (
        |  SELECT d0, d1 FROM bounds
        |  UNION ALL
        |  SELECT CAST(d + INTERVAL '1' DAY AS DATE), d1 FROM cal WHERE d < d1
        |),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE user_id < 3 AND event_type = 'purchase'
        |  GROUP BY CAST(ts AS DATE)
        |)
        |SELECT cal.d, COALESCE(daily.n, CAST(0 AS BIGINT)) AS n_events,
        |       CAST(CASE WHEN daily.d IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
        |FROM cal LEFT JOIN daily ON cal.d = daily.d
        |ORDER BY cal.d""".stripMargin),

    // Sequential time-series pass via WITH RECURSIVE (added r7): CUSUM
    // change detection + half-life-1 EMA over each type's daily volumes —
    // the two canonical stateful smoothers a declarative window cannot
    // express (each day's value depends on the previous OUTPUT, not the
    // previous input). One recursion advances every type in lockstep by
    // day rank, carrying its per-type (n, sa) reference stats INSIDE the
    // rows (the q_recursive_calendar lesson — a scalar subquery in the
    // loop body would re-run per iteration). Float discipline: CUSUM runs
    // in n-scaled integer units — s = max(0, s + n·c − sa) is exact BIGINT
    // and the alarm s > 3·sa (≈ 3 mean-days of cumulative excess) is an
    // integer comparison; the EMA's α = ½ makes every step one exact-int
    // add + one division by 2 (exact in binary) — both recursions are
    // bit-deterministic on both engines by construction. Recursion depth =
    // the calendar span, far under either engine's limit; at 100 TB the
    // daily grid this recurses over is calendar-bounded, not corpus-sized.
    //
    // EXECUTION shape (measured r7, see [[CusumSparkSql]]): the loop body
    // must be JOIN-FREE — a body that joins even a tiny cached grid pays
    // ~0.25 s of UnionLoop driver floor PER ITERATION (8.4 s at 30 days);
    // carrying each type's sorted day/count arrays inside the recursion
    // row makes every iteration a pure projection (sub-second total). The
    // two dialects differ only in list indexing (element_at vs [ ]) and
    // the ordered-list aggregate; the recursion arithmetic is verbatim
    // identical.
    "cusum_drift" -> Q(
      fn = (s, dir) => { Tables.registerAll(s, dir); s.sql(CusumSparkSql) },
      oracle = Some(CusumDuckSql)),

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

    // TPC-H Q3-style: shipping-priority revenue top-10
    "q3_shipping_priority" -> sqlQ(
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin),

    // TPC-H Q10-style: returned-item revenue per customer, top-20
    "q10_returned_items" -> sqlQ(
      """SELECT c_custkey, c_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       n_name
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin),

    // TPC-H Q18-style: large-volume orders (HAVING-filtered IN subquery)
    "q18_large_orders" -> sqlQ(
      """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       SUM(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 120)
        |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin),

    // TPC-H Q4-style: orders with a late shipment (correlated EXISTS);
    // adapted to this schema — "late" = any line shipped > 90 days after
    // the order date (no commit/receipt dates in the corpus)
    "q4_late_orders" -> sqlQ(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL '90' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // TPC-H Q14-style: promo revenue share (ratio of exact decimal sums in
    // double — both operands exact, so the division is deterministic)
    "q14_promo_share" -> sqlQ(
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |        ELSE CAST(0 AS DECIMAL(37,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_pct,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin),

    // correlated LATERAL subquery
    "q_lateral" -> sqlQ(
      """SELECT n_name, t.n_cust, t.max_bal
        |FROM nation, LATERAL (
        |  SELECT COUNT(*) AS n_cust, MAX(c_acctbal) AS max_bal
        |  FROM customer WHERE c_nationkey = n_nationkey) t
        |WHERE t.n_cust > 0
        |ORDER BY n_name""".stripMargin),

    // inline VALUES table joined against real data
    "q_values_inline" -> sqlQ(
      """SELECT v.tier, COUNT(*) AS n
        |FROM customer
        |JOIN (VALUES ('BUILDING', 'premium'), ('AUTOMOBILE', 'standard'),
        |             ('MACHINERY', 'standard')) AS v(seg, tier)
        |  ON c_mktsegment = v.seg
        |GROUP BY v.tier ORDER BY v.tier""".stripMargin),

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

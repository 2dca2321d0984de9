package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2.2 relational surface: projection/filter, joins of every flavor,
  * aggregation, windows, sort/top-k, set ops, scalar functions, date/time,
  * JSON, arrays. Each query is one Spark program + one DuckDB oracle with
  * aligned column names and a total ORDER BY on both sides.
  */
object RelationalQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val oneDec = lit(1).cast("decimal(18,2)")

  val all: Map[String, Q] = Map(

    // ---- projection / filter / CASE / IN / BETWEEN / LIKE ----------------
    "q2_filter_project" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "part")
          .filter(col("p_size").between(10, 40) &&
            col("p_type").rlike("PROMO|ECONOMY") &&
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#10", "Brand#21"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            (dec("p_retailprice") * lit("1.10").cast("decimal(4,2)"))
              .cast("double").as("marked_up"),
            when(col("p_size") < 20, "small").otherwise("large").as("size_class"))
          .orderBy("p_partkey")
      },
      oracle = Some(
        """SELECT p_partkey, UPPER(p_name) AS uname,
          |       CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST('1.10' AS DECIMAL(4,2)) AS DOUBLE) AS marked_up,
          |       CASE WHEN p_size < 20 THEN 'small' ELSE 'large' END AS size_class
          |FROM part
          |WHERE p_size BETWEEN 10 AND 40
          |  AND regexp_matches(p_type, 'PROMO|ECONOMY')
          |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#10', 'Brand#21')
          |ORDER BY p_partkey""".stripMargin)),

    // ---- TPC-H Q6-style single-table filter + agg ------------------------
    "q6_forecast_revenue" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
          .agg(
            sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      oracle = Some(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- semi / anti joins ----------------------------------------------
    "q_semi_join" -> Q(
      fn = (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_mktsegment FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)),

    "q_anti_join" -> Q(
      fn = (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)),

    // ---- outer joins -----------------------------------------------------
    "q_outer_join" -> Q(
      fn = (s, dir) => {
        val n = Tables.load(s, dir, "nation")
        val c = Tables.load(s, dir, "customer")
          .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
        n.join(c, col("n_nationkey") === col("c_nationkey"), "left")
          .select(col("n_name"), coalesce(col("n_cust"), lit(0L)).as("n_cust"))
          .orderBy("n_name")
      },
      oracle = Some(
        """SELECT n_name, COALESCE(c.n_cust, 0) AS n_cust
          |FROM nation LEFT JOIN
          |  (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
          |  ON n_nationkey = c_nationkey
          |ORDER BY n_name""".stripMargin)),

    // ---- right outer join ------------------------------------------------
    "q_right_outer" -> Q(
      fn = (s, dir) => {
        val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000)
        val c = Tables.load(s, dir, "customer")
        big.join(c, col("o_custkey") === col("c_custkey"), "right")
          .groupBy("c_mktsegment")
          .agg(count(col("o_orderkey")).as("n_big_orders"), count(lit(1)).as("n_rows"))
          .orderBy("c_mktsegment")
      },
      oracle = Some(
        """SELECT c_mktsegment, COUNT(o_orderkey) AS n_big_orders, COUNT(*) AS n_rows
          |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
          |RIGHT JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- full outer join -------------------------------------------------
    "q_full_outer" -> Q(
      fn = (s, dir) => {
        val cn = Tables.load(s, dir, "customer")
          .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
        val sn = Tables.load(s, dir, "supplier")
          .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
        cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      oracle = Some(
        """WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
          |     sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
          |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
          |       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
          |FROM cn FULL JOIN sn ON c_nationkey = s_nationkey
          |ORDER BY nationkey""".stripMargin)),

    // ---- math scalar functions ------------------------------------------
    // (no libm-dependent fns: ln/exp rounding differs across engines;
    // abs/floor/ceil/%/sign/sqrt/round on binary doubles are IEEE-exact)
    "q_math_funcs" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "customer")
          .select(
            col("c_custkey"),
            abs(col("c_acctbal")).as("abs_bal"),
            floor(col("c_acctbal")).as("floor_bal"),
            ceil(col("c_acctbal")).as("ceil_bal"),
            (col("c_custkey") % 7).as("mod7"),
            signum(col("c_acctbal")).as("sign_bal"),
            sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
            round(col("c_acctbal").cast("decimal(12,2)"), 1).cast("double").as("round1"))
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey,
          |       abs(c_acctbal) AS abs_bal,
          |       CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
          |       CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
          |       c_custkey % 7 AS mod7,
          |       CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
          |       sqrt(abs(c_acctbal)) AS sqrt_bal,
          |       CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS round1
          |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- cross join ------------------------------------------------------
    "q_cross_join" -> Q(
      fn = (s, dir) => {
        val r = Tables.load(s, dir, "region").select(col("r_name"))
        val n = Tables.load(s, dir, "nation").select(col("n_name"))
        r.crossJoin(n).orderBy("r_name", "n_name")
      },
      oracle = Some(
        "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name")),

    // ---- per-group top-k via row_number ---------------------------------
    "q_topk_per_group" -> Q(
      fn = (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
          .orderBy("o_custkey", "rk")
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          |  FROM orders) t
          |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin),
      headline = true),

    // ---- lag/lead: inter-event gaps -------------------------------------
    "q_window_lag" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events").filter(col("user_id") < 10)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.select(
            col("user_id"), col("event_id"),
            (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP), 1) OVER w) AS gap_us,
          |       LEAD(event_type, 1) OVER w AS next_type
          |FROM events WHERE user_id < 10
          |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
          |ORDER BY user_id, event_id""".stripMargin)),

    // ---- running sum with an explicit frame -----------------------------
    "q_running_sum" -> Q(
      fn = (s, dir) => {
        val o = Tables.load(s, dir, "orders").filter(col("o_custkey") < 20)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(
            col("o_custkey"), col("o_orderkey"),
            sum(dec("o_totalprice")).over(w).cast("double").as("running_spend"))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
          |FROM orders WHERE o_custkey < 20
          |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- rank / dense_rank ----------------------------------------------
    "q_rank_dense" -> Q(
      fn = (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
        c.select(col("c_mktsegment"), col("c_custkey"),
            rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
          .filter(col("rnk") <= 5)
          .orderBy("c_mktsegment", "rnk", "c_custkey")
      },
      oracle = Some(
        """SELECT c_mktsegment, c_custkey, CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk FROM (
          |  SELECT c_mktsegment, c_custkey,
          |         RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
          |  FROM customer
          |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)) t
          |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin)),

    // ---- rollup ----------------------------------------------------------
    "q_rollup_day" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .withColumn("day", to_date(date_trunc("day", col("ts"))))
          .rollup("event_type", "day")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
      },
      oracle = Some(
        """SELECT event_type, day, COUNT(*) AS n FROM (
          |  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day FROM events) t
          |GROUP BY ROLLUP (event_type, day)
          |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin)),

    // ---- cube ------------------------------------------------------------
    "q_cube_flags" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      oracle = Some(
        """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
          |FROM lineitem
          |GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- grouping sets (SQL entry point) --------------------------------
    "q_grouping_sets" -> Q(
      fn = (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      oracle = Some(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- set operations --------------------------------------------------
    "q_set_ops" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id")).distinct()
        val both = users("purchase").intersect(users("error"))
          .agg(count(lit(1)).as("n")).select(lit("purchase_and_error").as("tag"), col("n"))
        val only = users("purchase").except(users("error"))
          .agg(count(lit(1)).as("n")).select(lit("purchase_not_error").as("tag"), col("n"))
        val either = users("purchase").union(users("error")).distinct()
          .agg(count(lit(1)).as("n")).select(lit("purchase_or_error").as("tag"), col("n"))
        both.unionAll(only).unionAll(either).orderBy("tag")
      },
      oracle = Some(
        """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
          |     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
          |SELECT 'purchase_and_error' AS tag, COUNT(*) AS n FROM (SELECT * FROM p INTERSECT SELECT * FROM e) t
          |UNION ALL
          |SELECT 'purchase_not_error' AS tag, COUNT(*) AS n FROM (SELECT * FROM p EXCEPT SELECT * FROM e) t
          |UNION ALL
          |SELECT 'purchase_or_error' AS tag, COUNT(*) AS n FROM (SELECT * FROM p UNION SELECT * FROM e) t
          |ORDER BY tag""".stripMargin)),

    // ---- outer explode: empty arrays keep their row with NULL -----------
    // (digit tokens: this corpus has none, so every array is empty — the
    // pointed difference between explode, which drops the row, and
    // explode_outer, which keeps it)
    "q_explode_outer" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "documents").filter(col("doc_id") < 50)
          .withColumn("digits", expr("regexp_extract_all(text, '[0-9]+', 0)"))
          .select(col("doc_id"), size(col("digits")).as("n_digits"),
            explode_outer(col("digits")).as("digit"))
          .orderBy(col("doc_id"), col("digit").asc_nulls_first)
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[0-9]+') AS digits
          |           FROM documents WHERE doc_id < 50)
          |SELECT doc_id, CAST(len(digits) AS INTEGER) AS n_digits,
          |       UNNEST(CASE WHEN digits IS NULL OR len(digits) = 0 THEN [NULL] ELSE digits END) AS digit
          |FROM t ORDER BY doc_id, digit ASC NULLS FIRST""".stripMargin)),

    // ---- bag semantics: INTERSECT ALL / EXCEPT ALL ----------------------
    "q_set_ops_all" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def types(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
        // multiset intersection/difference of per-event user occurrence bags
        val inter = types("purchase").intersectAll(types("error"))
          .groupBy("user_id").agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        val exc = types("purchase").exceptAll(types("error"))
          .groupBy("user_id").agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        inter.unionAll(exc).select("op", "user_id", "n").orderBy("op", "user_id")
      },
      oracle = Some(
        """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
          |     e AS (SELECT user_id FROM events WHERE event_type = 'error'),
          |i AS (SELECT user_id FROM p INTERSECT ALL SELECT user_id FROM e),
          |x AS (SELECT user_id FROM p EXCEPT ALL SELECT user_id FROM e)
          |SELECT 'intersect_all' AS op, user_id, COUNT(*) AS n FROM i GROUP BY 2
          |UNION ALL
          |SELECT 'except_all' AS op, user_id, COUNT(*) AS n FROM x GROUP BY 2
          |ORDER BY op, user_id""".stripMargin)),

    // ---- array construction / manipulation functions --------------------
    "q_array_funcs" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
          .withColumn("toks", split(col("text"), " "))
          .select(
            col("doc_id"),
            expr("array_join(slice(sort_array(toks), 1, 3), ',')").as("first3_sorted"),
            array_contains(col("toks"), "data").as("has_data"),
            size(array_distinct(col("toks"))).as("n_distinct"),
            element_at(col("toks"), -1).as("last_tok"),
            expr("size(flatten(array(toks, toks)))").as("doubled_len"),
            expr("size(sequence(1, size(toks)))").as("seq_len"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 100)
          |SELECT doc_id,
          |       array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
          |       list_contains(toks, 'data') AS has_data,
          |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
          |       toks[-1] AS last_tok,
          |       CAST(len(flatten([toks, toks])) AS INTEGER) AS doubled_len,
          |       CAST(len(range(1, len(toks) + 1)) AS INTEGER) AS seq_len
          |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- exact distinct -------------------------------------------------
    "q_count_distinct" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      oracle = Some(
        """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- approximate distinct (HLL) --------------------------------------
    // The HLL estimate is engine-specific by design, so the oracle checks it
    // indirectly: the exact distinct count is oracled exactly, and the
    // estimate is folded into a deterministic within_tolerance boolean
    // (|approx − exact| / exact ≤ 5·rsd) that the oracle emits as literal
    // TRUE. The estimate is thereby driver-verified without requiring
    // bit-identical sketches. 5·rsd, not 3: HLL++'s bias-corrected error is
    // not a hard 3-sigma bound at every cardinality (the previous 3·rsd gate
    // did pass at sf0.001-0.1, so observed error is ≤ 0.06; 0.10 keeps slack
    // without accepting a broken sketch). greatest(exact, 1): a group whose user_id
    // values are all NULL has exact = approx = 0, and 0/1 = 0 keeps the
    // boolean TRUE instead of NULL (legacy) / DIVIDE_BY_ZERO (ANSI).
    "q_approx_distinct" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.02).as("approx"))
          .select(
            col("event_type"),
            col("exact_users"),
            (abs(col("approx") - col("exact_users")).cast("double") /
              greatest(col("exact_users"), lit(1L)).cast("double") <= 0.10).as("within_tolerance"))
          .orderBy("event_type")
      },
      oracle = Some(
        """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_tolerance
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- string functions -----------------------------------------------
    "q_string_funcs" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "part").filter(col("p_partkey") <= 500)
          .select(
            col("p_partkey"),
            lower(col("p_brand")).as("lbrand"),
            substring(col("p_name"), 1, 8).as("prefix"),
            length(col("p_name")).as("name_len"),
            regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
            regexp_replace(col("p_type"), "[AEIOU]", "_").as("devoweled"),
            concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
            col("p_name").like("%ar%").as("has_ar"))
          .orderBy("p_partkey")
      },
      oracle = Some(
        """SELECT p_partkey, LOWER(p_brand) AS lbrand, substring(p_name, 1, 8) AS prefix,
          |       CAST(length(p_name) AS INTEGER) AS name_len,
          |       regexp_extract(p_type, '^(\w+)', 1) AS first_word,
          |       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
          |       p_brand || '|' || p_type AS joined,
          |       p_name LIKE '%ar%' AS has_ar
          |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    // ---- date/time functions --------------------------------------------
    "q_date_funcs" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .select(
            to_date(date_trunc("month", col("ts"))).as("month"),
            hour(col("ts")).as("hr"),
            (dayofweek(col("ts")) - 1).as("dow")) // Spark: 1=Sunday → 0=Sunday
          .groupBy("month", "hr", "dow")
          .agg(count(lit(1)).as("n"))
          .orderBy("month", "hr", "dow")
      },
      oracle = Some(
        """SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month,
          |       CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
          |       CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
          |       COUNT(*) AS n
          |FROM events GROUP BY 1, 2, 3 ORDER BY month, hr, dow""".stripMargin)),

    // ---- tumbling time window (batch window(), §2.3's batch twin) -------
    "q_tumbling_window" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec("value")).cast("double").as("sum_value"))
          .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("w_start", "event_type")
      },
      oracle = Some(
        """SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin),
      headline = true),

    // ---- JSON extraction -------------------------------------------------
    "q_json_props" -> Q(
      fn = (s, dir) => {
        val schema = "k INT"
        Tables.load(s, dir, "events")
          .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL(schema)).getField("k"))
          .groupBy("event_type")
          .agg(
            sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
            count(when(col("k") > 50, 1)).as("n_high"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH t AS (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k FROM events)
          |SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k,
          |       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k,
          |       COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high
          |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- arrays: explode + top-k tokens ---------------------------------
    "q_token_topk" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)
      },
      oracle = Some(
        """SELECT token, COUNT(*) AS n
          |FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
          |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin)),

    // ---- range (theta) join: event pairs within 1 hour per user ---------
    "q_range_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        val a = ev.toDF("user_id", "a_id", "a_us")
        val b = ev.toDF("user_id", "b_id", "b_us")
        a.join(b, Seq("user_id"))
          .filter(col("a_id") < col("b_id") &&
            abs(col("a_us") - col("b_us")) <= 3600000000L)
          .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      oracle = Some(
        """SELECT a.user_id, COUNT(*) AS n_pairs
          |FROM events a JOIN events b
          |  ON a.user_id = b.user_id AND a.event_id < b.event_id
          | AND abs(epoch_us(CAST(a.ts AS TIMESTAMP)) - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 3600000000
          |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin)),

    // ---- session windows (batch twin of §2.3; DuckDB oracle is the
    // classic gaps-and-islands formulation) -------------------------------
    "q_session_window" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), col("sw.start").as("s_start"), col("sw.end").as("s_end"), col("n"))
          .orderBy("user_id", "s_start")
      },
      oracle = Some(
        """WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |o AS (SELECT user_id, ts,
          |        CASE WHEN LAG(ts) OVER w IS NULL
          |               OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
          |        -- >= : Spark merges half-open [t, t+gap) intervals, so a
          |        -- gap of exactly 30 minutes starts a NEW session
          |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |sess AS (SELECT user_id, ts,
          |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM o)
          |SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL '30 minutes' AS s_end, COUNT(*) AS n
          |FROM sess GROUP BY user_id, sid
          |ORDER BY user_id, s_start""".stripMargin)),

    // ---- sliding windows: every event lands in length/slide windows -----
    "q_sliding_window" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "12 hours", "6 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("w_start"), col("event_type"), col("n"))
          .orderBy("w_start", "event_type")
      },
      oracle = Some(
        """WITH starts AS (
          |  SELECT event_type, time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start FROM events
          |  UNION ALL
          |  SELECT event_type, time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) - INTERVAL '6 hours' FROM events)
          |SELECT w_start, event_type, COUNT(*) AS n
          |FROM starts GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // ---- JSON as a first-class map column -------------------------------
    "q_json_map" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events").filter(col("event_id") < 1000)
          .select(
            col("event_id"),
            col("props"),
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)).as("m"))
          .select(
            col("event_id"),
            array_join(map_keys(col("m")), ",").as("keys"),
            element_at(col("m"), "k").as("k_value"),
            get_json_object(col("props"), "$.k").cast("int").as("k_via_path"))
          .orderBy("event_id")
      },
      oracle = Some(
        """SELECT event_id,
          |       regexp_extract(props, '"(\w+)":', 1) AS keys,
          |       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_value,
          |       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_via_path
          |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin)),

    // ---- as-of join ------------------------------------------------------
    // For each purchase: the most recent prior-or-same-instant view by the
    // same user. Spark composes it from a tagged union + last(ignoreNulls)
    // over an ordered window (no custom plan needed — SURVEY preference (a));
    // the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so two entirely
    // different formulations must agree.
    "q_asof_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        // right side deduped to one row per (user, ts) for determinism
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val tagged = views.select(col("user_id"), col("ts"),
            col("view_id"), unix_micros(col("ts")).as("view_us"),
            lit(null).cast("bigint").as("purchase_id"), lit(0).as("kind"))
          .unionByName(purchases.select(col("user_id"), col("ts"),
            lit(null).cast("bigint").as("view_id"), lit(null).cast("bigint").as("view_us"),
            col("event_id").as("purchase_id"), lit(1).as("kind")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("kind")) // view sorts before purchase at equal ts
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("asof_view", last(col("view_id"), ignoreNulls = true).over(w))
          .withColumn("asof_view_us", last(col("view_us"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(
            col("purchase_id").as("event_id"), col("user_id"),
            col("asof_view").as("view_id"),
            (unix_micros(col("ts")) - col("asof_view_us")).as("gap_us"))
          .orderBy("event_id")
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, MAX(event_id) AS view_id
          |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id, v.view_id,
          |       epoch_us(p.pts) - epoch_us(v.vts) AS gap_us
          |FROM p ASOF LEFT JOIN v
          |  ON p.user_id = v.user_id AND p.pts >= v.vts
          |ORDER BY p.event_id""".stripMargin)),

    // ---- as-of join with tolerance: match only within a 2h lookback -----
    "q_asof_tolerance" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val tagged = views.select(col("user_id"), col("ts"),
            col("view_id"), unix_micros(col("ts")).as("view_us"),
            lit(null).cast("bigint").as("purchase_id"), lit(0).as("kind"))
          .unionByName(purchases.select(col("user_id"), col("ts"),
            lit(null).cast("bigint").as("view_id"), lit(null).cast("bigint").as("view_us"),
            col("event_id").as("purchase_id"), lit(1).as("kind")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("asof_view", last(col("view_id"), ignoreNulls = true).over(w))
          .withColumn("asof_view_us", last(col("view_us"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .withColumn("gap_us", unix_micros(col("ts")) - col("asof_view_us"))
          // tolerance: matches older than 2h are dropped back to NULL
          .select(
            col("purchase_id").as("event_id"), col("user_id"),
            when(col("gap_us") <= 7200000000L, col("asof_view")).as("view_id"),
            when(col("gap_us") <= 7200000000L, col("gap_us")).as("gap_us"))
          .orderBy("event_id")
      },
      oracle = Some(
        """WITH v AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, MAX(event_id) AS view_id
          |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
          |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, event_id FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id,
          |       CASE WHEN epoch_us(p.pts) - epoch_us(v.vts) <= 7200000000 THEN v.view_id END AS view_id,
          |       CASE WHEN epoch_us(p.pts) - epoch_us(v.vts) <= 7200000000
          |            THEN epoch_us(p.pts) - epoch_us(v.vts) END AS gap_us
          |FROM p ASOF LEFT JOIN v
          |  ON p.user_id = v.user_id AND p.pts >= v.vts
          |ORDER BY p.event_id""".stripMargin)),

    // ---- min_by / max_by (argmin-argmax aggregates) ---------------------
    // ---- equi-width value histogram (added r6) ---------------------------
    // The profiling verb next to quantiles: fixed-width bins (width 50 from
    // 0) per event_type, with per-bin bounds — the shape behind data-
    // profiling dashboards and CBO histogram statistics. bin = floor(v/50)
    // is one correctly-rounded double division + floor, bit-identical on
    // both engines for identical stored doubles; everything else is exact
    // ints. Scale: one hash agg on (event_type, bin) — map-side combine
    // collapses to n_types × n_bins rows per partition.
    "value_histogram" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .withColumn("bin", floor(col("value") / 50.0).cast("int"))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("bin_min"), max(col("value")).as("bin_max"))
          .withColumn("bin_lo", col("bin") * 50.0)
          .select("event_type", "bin", "bin_lo", "n", "bin_min", "bin_max")
          .orderBy("event_type", "bin")
      },
      oracle = Some(
        """SELECT event_type, CAST(FLOOR("value" / 50.0) AS INTEGER) AS bin,
          |       CAST(CAST(FLOOR("value" / 50.0) AS INTEGER) * 50.0 AS DOUBLE) AS bin_lo,
          |       COUNT(*) AS n, MIN("value") AS bin_min, MAX("value") AS bin_max
          |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin)),

    // ---- join-key skew diagnostics (added r6) ----------------------------
    // The pre-join audit behind the salting decision (SkewUtils): per key
    // column — total rows, distinct keys, the heaviest key's share, the
    // top-10 keys' combined share, and the Herfindahl concentration index
    // HHI = Σ(cᵢ/n)². Everything reduces to exact integer/decimal sums
    // (c² through DECIMAL(38,0) — a raw int64 square overflows at the
    // 3×10⁹-row keys this is FOR) with one correctly-rounded double
    // division each at the end, so parity needs no float discipline. Scale
    // shape: one hash agg per key column, a 10-row TakeOrdered, two 1-row
    // broadcasts — the fact tables are shuffled once each, as (key, count)
    // partials.
    "skew_profile" -> Q(
      fn = (s, dir) => {
        def profile(counts: DataFrame, label: String): DataFrame = {
          val stats = counts.agg(
            sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
            max(col("c")).as("max_count"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("sumsq"))
          val top10 = counts.orderBy(col("c").desc, col("k")).limit(10)
            .agg(sum(col("c")).as("top10"))
          stats.crossJoin(broadcast(top10))
            .select(lit(label).as("key_table"),
              col("n_rows"), col("n_keys"), col("max_count"),
              Q.grid6(col("max_count").cast("double") / col("n_rows").cast("double"))
                .as("max_share"),
              Q.grid6(col("top10").cast("double") / col("n_rows").cast("double"))
                .as("top10_share"),
              Q.grid6(col("sumsq").cast("double") /
                (col("n_rows").cast("double") * col("n_rows").cast("double")))
                .as("hhi"))
        }
        val uc = Tables.load(s, dir, "events")
          .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("c"))
        val pc = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
        profile(uc, "events.user_id")
          .unionByName(profile(pc, "lineitem.l_partkey"))
          .orderBy("key_table")
      },
      oracle = Some(
        """WITH uc AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
          |pc AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
          |prof AS (
          |  SELECT 'events.user_id' AS key_table,
          |         CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
          |         MAX(c) AS max_count,
          |         SUM(CAST(c AS DECIMAL(38,0)) * c) AS sumsq,
          |         (SELECT SUM(c) FROM (SELECT c FROM uc ORDER BY c DESC, k LIMIT 10)) AS top10
          |  FROM uc
          |  UNION ALL
          |  SELECT 'lineitem.l_partkey',
          |         CAST(SUM(c) AS BIGINT), COUNT(*), MAX(c),
          |         SUM(CAST(c AS DECIMAL(38,0)) * c),
          |         (SELECT SUM(c) FROM (SELECT c FROM pc ORDER BY c DESC, k LIMIT 10))
          |  FROM pc)
          |SELECT key_table, n_rows, n_keys, max_count,
          |       floor(CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE)
          |             * 1000000.0) / 1000000.0 AS max_share,
          |       floor(CAST(top10 AS DOUBLE) / CAST(n_rows AS DOUBLE)
          |             * 1000000.0) / 1000000.0 AS top10_share,
          |       floor(CAST(sumsq AS DOUBLE)
          |             / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))
          |             * 1000000.0) / 1000000.0 AS hhi
          |FROM prof ORDER BY key_table""".stripMargin)),

    "q_minby_maxby" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(
            min_by(col("event_type"), col("event_id")).as("first_type"),
            max_by(col("event_type"), col("event_id")).as("last_type"),
            max_by(col("value"), col("event_id")).as("last_value"))
          .orderBy("user_id")
      },
      oracle = Some(
        """SELECT user_id,
          |       arg_min(event_type, event_id) AS first_type,
          |       arg_max(event_type, event_id) AS last_type,
          |       arg_max("value", event_id) AS last_value
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- boolean / conditional-count aggregates (added r6) ---------------
    "q_bool_aggs" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(
            count_if(col("value") > 100).as("n_over100"),
            bool_and(col("value") >= 0).as("all_nonneg"),
            bool_or(col("value") > 490).as("any_huge"))
          .orderBy("event_type")
      },
      oracle = Some(
        """SELECT event_type,
          |       CAST(SUM(CASE WHEN "value" > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_over100,
          |       bool_and("value" >= 0) AS all_nonneg,
          |       bool_or("value" > 490) AS any_huge
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- IGNORE NULLS value windows (added r6) ---------------------------
    // Carry-forward of the last non-null observation — the gap-filling
    // primitive (LOCF): per user, the value of their LAST purchase in
    // (ts, event_id) order, read through last_value(..., IGNORE NULLS)
    // over the full partition frame; users with no purchase carry NULL.
    "q_ignore_nulls" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        Tables.load(s, dir, "events")
          .withColumn("purchase_value",
            when(col("event_type") === "purchase", col("value")))
          .withColumn("last_purchase",
            last(col("purchase_value"), ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            first(col("last_purchase"), ignoreNulls = false).as("last_purchase"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH t AS (SELECT user_id, ts, event_id,
          |                  CASE WHEN event_type = 'purchase' THEN "value" END AS pv
          |           FROM events),
          |w AS (SELECT user_id,
          |             LAST_VALUE(pv IGNORE NULLS) OVER (
          |               PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_purchase
          |      FROM t)
          |SELECT user_id, COUNT(*) AS n_events, ANY_VALUE(last_purchase) AS last_purchase
          |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- pivot -----------------------------------------------------------
    "q_pivot" -> Q(
      fn = (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.load(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .count()
        types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy("user_id")
      },
      oracle = Some(
        """SELECT user_id,
          |       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          |       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
          |       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          |       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          |       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- unpivot / melt --------------------------------------------------
    "q_unpivot" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
            "measure", "val")
          .orderBy("l_orderkey", "l_linenumber", "measure")
      },
      oracle = Some(
        """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
          |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM li
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM li
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM li
          |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin)),

    // ---- bitwise operators ----------------------------------------------
    "q_bitwise" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events").filter(col("event_id") < 500)
          .select(
            col("event_id"),
            col("event_id").bitwiseAND(255).as("b_and"),
            col("event_id").bitwiseOR(1024).as("b_or"),
            col("event_id").bitwiseXOR(255).as("b_xor"),
            shiftleft(col("event_id"), 2).as("b_shl"),
            shiftright(col("event_id"), 1).as("b_shr"),
            bit_count(col("event_id")).as("b_pop"))
          .orderBy("event_id")
      },
      oracle = Some(
        """SELECT event_id,
          |       event_id & 255 AS b_and,
          |       event_id | 1024 AS b_or,
          |       xor(event_id, 255) AS b_xor,
          |       event_id << 2 AS b_shl,
          |       event_id >> 1 AS b_shr,
          |       CAST(bit_count(event_id) AS INTEGER) AS b_pop
          |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin)),

    // ---- ordered string aggregation -------------------------------------
    "q_listagg" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      oracle = Some(
        """SELECT o_orderstatus,
          |       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
          |       COUNT(*) AS n
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- value-based RANGE window frame (1h trailing sum per user) ------
    "q_range_frame" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.load(s, dir, "events").filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), dec("value").as("v"))
          .withColumn("trailing_1h", sum(col("v")).over(w).cast("double"))
          .select("user_id", "event_id", "trailing_1h")
          .orderBy("user_id", "event_id")
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (
          |         PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
          |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h
          |FROM events WHERE user_id < 10
          |ORDER BY user_id, event_id""".stripMargin)),

    // ---- null semantics: nullif/coalesce/CASE ---------------------------
    "q_null_handling" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "customer")
          .select(
            col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<none>")).as("seg_filled"),
            when(col("c_acctbal") < 0, "debt")
              .when(col("c_acctbal") < 5000, "low").otherwise("high").as("bal_class"))
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey,
          |       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
          |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<none>') AS seg_filled,
          |       CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class
          |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- statistical moments: exact-sum stddev / var / covar / corr ------
    // The second-moment aggregates the surface had not yet exposed, built
    // the only way they can be cross-engine-checkable: NOT the built-in
    // stddev_samp()/corr() (both engines stream doubles in partial-sum
    // order, so results drift with parallelism), but the daily_anomalies
    // discipline lifted to two variables. value is put on its 2-dp grid
    // and scaled to exact BIGINT cents; y = props.k is a small int. All
    // six sufficient statistics (n, Σx, Σx², Σy, Σy², Σxy) are exact
    // integer sums; the cross terms n·Σx²−(Σx)² etc. are computed as
    // DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact on both — and every
    // reported float is a fixed identical chain of correctly-rounded ops
    // (two casts + one division, plus one sqrt each for stddev/corr). The
    // cents scale factors are exact powers of 10 folded into double-exact
    // integer denominators (n(n−1)·10⁴ < 2⁵³), so each output needs ONE
    // division; corr's scale factors cancel entirely.
    //
    // Scale shape: ONE hash agg with map-side combine collapsing to
    // ≤ |event_type| rows; the moment arithmetic runs on that tiny frame.
    // Identical cost to the nondeterministic built-ins at 100 TB.
    "q_stats_moments" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val m = Tables.load(s, dir, "events")
          .select(col("event_type"),
            (dec("value") * 100).cast("bigint").as("c"),
            get_json_object(col("props"), "$.k").cast("bigint").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("c")).as("sx"), sum(col("c") * col("c")).as("sxx"),
            sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
            sum(col("c") * col("y")).as("sxy"))
        val vx = (big(col("n")) * big(col("sxx")) - big(col("sx")) * big(col("sx"))).cast("double")
        val vy = (big(col("n")) * big(col("syy")) - big(col("sy")) * big(col("sy"))).cast("double")
        val cv = (big(col("n")) * big(col("sxy")) - big(col("sx")) * big(col("sy"))).cast("double")
        m.select(col("event_type"), col("n"),
            (vx / (col("n") * (col("n") - 1) * 10000L).cast("double")).as("var_x"),
            sqrt(vx / (col("n") * (col("n") - 1) * 10000L).cast("double")).as("stddev_x"),
            (cv / (col("n") * (col("n") - 1) * 100L).cast("double")).as("covar_xy"),
            (cv / (sqrt(vx) * sqrt(vy))).as("corr_xy"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_type,
          |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
          |         CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS y
          |  FROM events),
          |m AS (
          |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
          |         CAST(SUM(c) AS HUGEINT) AS sx, CAST(SUM(c * c) AS HUGEINT) AS sxx,
          |         CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(y * y) AS HUGEINT) AS syy,
          |         CAST(SUM(c * y) AS HUGEINT) AS sxy
          |  FROM t GROUP BY event_type)
          |SELECT event_type, CAST(n AS BIGINT) AS n,
          |       CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) * 10000 AS DOUBLE) AS var_x,
          |       sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) * 10000 AS DOUBLE)) AS stddev_x,
          |       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * (n - 1) * 100 AS DOUBLE) AS covar_xy,
          |       CAST(n * sxy - sx * sy AS DOUBLE)
          |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_xy
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- distribution windows: percent_rank / cume_dist / ntile ----------
    // The rank-normalizing window family (the primitives behind
    // quality_buckets' tercile arithmetic, exposed directly). Ordering is
    // the UNIQUE event_id, so rank semantics cannot depend on tie-breaking:
    // percent_rank = (rank−1)/(n−1) and cume_dist = rank/n are single
    // correctly-rounded divisions of exact small ints on both engines, and
    // ntile's uneven-bucket rule (first n mod k tiles get the extra row) is
    // the same standard-SQL rule in Spark and DuckDB.
    //
    // Scale shape: one shuffle on user_id; each partition is one user's
    // events — bounded by per-user activity, never corpus-global. (The
    // global variant of these is exactly what quality_buckets' stitched
    // rank exists to avoid.)
    "q_dist_window" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.load(s, dir, "events").filter(col("user_id") < 20)
          .select(col("user_id"), col("event_id"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).as("tile"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       percent_rank() OVER w AS pr,
          |       cume_dist() OVER w AS cd,
          |       CAST(ntile(4) OVER w AS INTEGER) AS tile
          |FROM events WHERE user_id < 20
          |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
          |ORDER BY user_id, event_id""".stripMargin))
  )
}

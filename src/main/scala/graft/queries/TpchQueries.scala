package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** The harder TPC-H-class queries (added round 5), adapted to the reduced
  * test-corpus schema (no partsupp table; no commit/receipt dates or ship
  * modes on lineitem — see TESTDATA.md). Beyond §2.2's basic join/agg rows,
  * these pin the optimizer behaviors a 100 TB engine leans on: correlated
  * subquery decorrelation (q17, q21, q22), count-distinct planning over an
  * anti-join (q16), disjunctive predicate pushdown (q19), multi-way
  * nation-pair star joins (q7, q8, q9), and two-level aggregation over an
  * outer join (q13).
  *
  * Float discipline as everywhere in this package: money sums as exact
  * decimals cast to double at the end; integral-valued doubles
  * (l_quantity) sum exactly in binary; ratios divide two exact operands.
  */
object TpchQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val oneDec = lit(1).cast("decimal(18,2)")
  /** revenue term: exact decimal extendedprice*(1-discount) */
  private def vol = dec("l_extendedprice") * (oneDec - dec("l_discount"))

  /** Shared-text queries: the identical SQL runs through spark.sql and DuckDB. */
  private def sqlQ(sql: String): Q =
    Q(fn = (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, oracle = Some(sql))

  val all: Map[String, Q] = Map(

    // ---- TPC-H Q7: volume shipping between a nation pair ------------------
    // Nation dims are filtered to the pair BEFORE the join so the fact-side
    // inner joins prune at the scan; both nation sides and supplier/customer
    // broadcast (dims are tiny next to lineitem at any scale).
    "q7_volume_shipping" -> Q(
      fn = (s, dir) => {
        val pair = Seq("NATION_1", "NATION_2")
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val su = Tables.load(s, dir, "supplier")
        val c = Tables.load(s, dir, "customer")
        val n1 = Tables.load(s, dir, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.load(s, dir, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
          .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(vol).cast("double").as("revenue"), count(lit(1)).as("n"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      oracle = Some(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM supplier
          |JOIN lineitem ON s_suppkey = l_suppkey
          |JOIN orders   ON o_orderkey = l_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- TPC-H Q8: market share of one supplier nation per year -----------
    // 8-way star join; the ratio divides two exact decimal sums in double.
    "q8_market_share" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val su = Tables.load(s, dir, "supplier")
        val c = Tables.load(s, dir, "customer")
        val p = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
        val nc = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("c_rkey"))
        val ns = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val r = Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nc), col("c_nationkey") === col("cn_key"))
          .join(broadcast(r), col("c_rkey") === col("r_regionkey"))
          .join(broadcast(ns), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_3", vol)
              .otherwise(lit(0).cast("decimal(37,4)"))).cast("double") /
              sum(vol).cast("double")).as("mkt_share"),
            count(lit(1)).as("n"))
          .orderBy("o_year")
      },
      oracle = Some(
        """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
          |       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
          |             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
          |             ELSE CAST(0 AS DECIMAL(37,4)) END) AS DOUBLE)
          |         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          |         AS mkt_share,
          |       COUNT(*) AS n
          |FROM part
          |JOIN lineitem ON p_partkey = l_partkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN orders   ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation n1 ON c_nationkey = n1.n_nationkey
          |JOIN region   ON n1.n_regionkey = r_regionkey
          |JOIN nation n2 ON s_nationkey = n2.n_nationkey
          |WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q9: product-type profit by supplier nation and year --------
    // No partsupp/ps_supplycost in the corpus: cost proxied as 10% of
    // retailprice per unit. Decimal shapes kept narrow so both engines
    // compute the identical exact value: vol DECIMAL(37,4) minus
    // (retail*0.10) DECIMAL(23,4) * qty DECIMAL(4,0).
    "q9_profit_by_nation" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val su = Tables.load(s, dir, "supplier")
        val p = Tables.load(s, dir, "part").filter(col("p_name").like("%rod%"))
        val n = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val amount = vol -
          (dec("p_retailprice") * lit("0.10").cast("decimal(4,2)")) *
            col("l_quantity").cast("decimal(4,0)")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("sn_key"))
          .groupBy(col("supp_nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast("double").as("profit"), count(lit(1)).as("n"))
          .orderBy("supp_nation", "o_year")
      },
      oracle = Some(
        """SELECT n_name AS supp_nation,
          |       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
          |                - (CAST(p_retailprice AS DECIMAL(18,2)) * CAST('0.10' AS DECIMAL(4,2)))
          |                  * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS profit,
          |       COUNT(*) AS n
          |FROM part
          |JOIN lineitem ON p_partkey = l_partkey
          |JOIN orders   ON o_orderkey = l_orderkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%rod%'
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- TPC-H Q12: priority class by line status (shared SQL text) -------
    // Adapted: no ship modes / receipt dates — "late" = shipped > 60 days
    // after order date; counts split by order priority class.
    "q12_priority_class" -> sqlQ(
      """SELECT l_linestatus,
        |       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_count,
        |       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL '60' DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // ---- TPC-H Q13: customer order-count distribution ---------------------
    // Two-level aggregate over a filtered LEFT join; customers with zero
    // qualifying orders must survive with c_count = 0.
    "q13_order_distribution" -> Q(
      fn = (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      oracle = Some(
        """SELECT c_count, COUNT(*) AS custdist
          |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |      FROM customer LEFT JOIN orders
          |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |      GROUP BY c_custkey) t
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---- TPC-H Q16: supplier variety per part attribute -------------------
    // count(DISTINCT) over an anti-join (suppliers in deficit excluded);
    // the NOT IN subquery side is null-free so anti-join semantics match.
    "q16_supplier_variety" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val p = Tables.load(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#13" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        val bad = Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
      },
      oracle = Some(
        """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#13'
          |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // ---- TPC-H Q17: small-quantity revenue (correlated avg subquery) ------
    // Decorrelated by hand on the Spark side the way Catalyst would: the
    // per-part average is computed only for the brand's partkeys (semi-join
    // pushdown) then joined back — the correlated scan never touches other
    // parts' lineitems. avg of integral doubles is exact-sum / count on
    // both engines.
    "q17_small_qty_revenue" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val selParts = Tables.load(s, dir, "part")
          .filter(col("p_brand") === "Brand#13").select("p_partkey")
        val partAvg = li
          .join(broadcast(selParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("ap_partkey"))
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(broadcast(selParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(partAvg), col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg((sum(dec("l_extendedprice")).cast("double") / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      oracle = Some(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
          |       COUNT(*) AS n
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#13'
          |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
          |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin)),

    // ---- TPC-H Q19: disjunctive pushdown ----------------------------------
    // Three OR'd brand/size/quantity bands; the common l_partkey = p_partkey
    // conjunct must still drive a single equi-join (not a nested loop).
    "q19_disjunctive_bands" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val p = Tables.load(s, dir, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
              col("l_quantity").between(20, 30)))
          .agg(sum(vol).cast("double").as("revenue"), count(lit(1)).as("n"))
      },
      oracle = Some(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // ---- TPC-H Q20: suppliers with excess qualifying volume ---------------
    // IN-subquery with HAVING → semi-join against a filtered aggregate;
    // threshold 300 ≈ the per-supplier median at every scale factor (the
    // per-supplier load is SF-invariant because suppliers scale with SF).
    "q20_excess_suppliers" -> Q(
      fn = (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val p = Tables.load(s, dir, "part")
          .filter(col("p_name").like("%widget%")).select("p_partkey")
        val su = Tables.load(s, dir, "supplier")
        val qualifying = li
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey").agg(sum("l_quantity").as("tot_qty"))
          .filter(col("tot_qty") > 300).select("l_suppkey")
        su.join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal").orderBy("s_name")
      },
      oracle = Some(
        """SELECT s_name, s_acctbal FROM supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
          |  WHERE p_name LIKE '%widget%'
          |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  GROUP BY l_suppkey HAVING SUM(l_quantity) > 300)
          |ORDER BY s_name""".stripMargin)),

    // ---- TPC-H Q21: sole blocking supplier (shared SQL text) --------------
    // Adapted: no receipt/commit dates — the "blamed" supplier is the only
    // one whose line in a finished multi-supplier order was returned.
    // Correlated EXISTS + NOT EXISTS with <> correlation on both.
    "q21_sole_blame" -> sqlQ(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin),

    // ---- TPC-H Q15: top supplier by quarterly revenue ---------------------
    // The revenue "view" is one shuffle agg on l_suppkey; the argmax is a
    // 1-row max broadcast-joined back (never a global sort) — at 100 TB the
    // fact scan aggregates map-side first and only |suppliers| rows reach
    // the reducers. The equality filter compares EXACT DECIMALS (doubles
    // would make "the" max ambiguous under reordered partial sums).
    "q15_top_supplier" -> Q(
      fn = (s, dir) => {
        val rev = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
          .groupBy("l_suppkey").agg(sum(vol).as("total_rev"))
        val mx = rev.agg(max(col("total_rev")).as("mx"))
        rev.join(broadcast(mx), col("total_rev") === col("mx"))
          // supplier unhinted: both sides of this join are |suppliers|-sized,
          // so beyond the broadcast threshold the right plan is a co-keyed
          // shuffle join, which size-based selection picks automatically
          .join(Tables.load(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_rev"))
          .orderBy("s_suppkey")
      },
      oracle = Some(
        """WITH revenue AS (
          |  SELECT l_suppkey,
          |         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
          |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
          |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)),

    // ---- TPC-H Q22: wealthy customers without large orders ----------------
    // Adapted: every customer has orders in this corpus, so "dormant" =
    // no order above 250000. Uncorrelated exact-average scalar subquery +
    // correlated NOT EXISTS (shared SQL text).
    "q22_dormant_wealthy" -> sqlQ(
      """SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),

    // ---- TPC-H Q2: minimum-cost supplier (added r6 — completes the tier) --
    // The classic correlated-min subquery, adapted: with no partsupp table
    // the (part, supplier) relation and its cost come from lineitem —
    // supplycost := MIN(extendedprice) over the pair's lineitems (exact
    // decimal, no division). Decorrelated as a per-part window minimum —
    // ONE pass over the (part, supplier) agg instead of a min-agg branch
    // joined back (which plans the expensive fact agg subtree twice and
    // leans on AQE exchange reuse to deduplicate; measured 1.55 → 1.1 s at
    // sf0.1). The window partitions by partkey, bounded by suppliers-per-
    // part at any scale; the region-restricted supplier dim broadcasts.
    // The sort key (acctbal DESC, n_name, s_name, partkey) is a total
    // order (names unique per supplier, one row per (part, supplier)), so
    // LIMIT 100 is deterministic.
    "q2_min_cost_supplier" -> Q(
      fn = (s, dir) => {
        val ps = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .agg(min(dec("l_extendedprice")).as("supplycost"))
        val eu = Tables.load(s, dir, "supplier")
          .join(Tables.load(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("partkey")
        ps.join(broadcast(eu), col("suppkey") === col("s_suppkey"))
          .withColumn("mc", min(col("supplycost")).over(w))
          .filter(col("supplycost") === col("mc"))
          .join(
            Tables.load(s, dir, "part")
              .filter(col("p_size") <= 10 && col("p_type") === "LARGE"),
            col("partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"),
            col("supplycost").cast("double").as("supplycost"))
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      oracle = Some(
        """WITH ps AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
          |                   MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
          |            FROM lineitem GROUP BY 1, 2),
          |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
          |       FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |                     JOIN region ON n_regionkey = r_regionkey
          |       WHERE r_name = 'EUROPE'),
          |eups AS (SELECT ps.partkey, ps.supplycost, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name
          |         FROM ps JOIN eu s ON s.s_suppkey = ps.suppkey),
          |minc AS (SELECT partkey, MIN(supplycost) AS mc FROM eups GROUP BY 1)
          |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
          |       CAST(e.supplycost AS DOUBLE) AS supplycost
          |FROM eups e JOIN minc m ON e.partkey = m.partkey AND e.supplycost = m.mc
          |            JOIN part p ON p.p_partkey = e.partkey
          |WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
          |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
          |LIMIT 100""".stripMargin)),

    // ---- TPC-H Q11: important stock (added r6 — completes the tier) -------
    // Per-part value within one region's suppliers, keeping parts above the
    // HAVING-threshold scalar subquery. Adapted: value := SUM(extendedprice)
    // off lineitem; the synthetic corpus is value-flat, so the classic
    // fixed-fraction cut is replaced by "above 1.5x the mean part value",
    // cross-multiplied (2*n*val > 3*total) so the comparison is exact
    // integer x decimal arithmetic — no division anywhere, bit-identical on
    // both engines. Scale shape: one fact agg on partkey, a 1-row total
    // broadcast, a scan-thin filter — the classic Q11 plan minus partsupp.
    "q11_important_stock" -> Q(
      fn = (s, dir) => {
        val value = Tables.load(s, dir, "lineitem")
          .join(broadcast(Tables.load(s, dir, "supplier")
              .join(Tables.load(s, dir, "nation"),
                col("s_nationkey") === col("n_nationkey"))
              .join(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE"),
                col("n_regionkey") === col("r_regionkey"))
              .select("s_suppkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(dec("l_extendedprice")).as("value"))
        val tot = value.agg(sum(col("value")).as("t"), count(lit(1)).as("n"))
        value.crossJoin(broadcast(tot))
          .filter(col("value") * col("n") * 2 > col("t") * 3)
          .select(col("partkey"), col("value").cast("double").as("value"))
          .orderBy(desc("value"), col("partkey"))
      },
      oracle = Some(
        """WITH val AS (SELECT l_partkey AS partkey,
          |                    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
          |             FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
          |                           JOIN nation ON n_nationkey = s_nationkey
          |                           JOIN region ON r_regionkey = n_regionkey
          |             WHERE r_name = 'EUROPE' GROUP BY 1),
          |tot AS (SELECT SUM(val) AS t, COUNT(*) AS n FROM val)
          |SELECT partkey, CAST(val AS DOUBLE) AS value FROM val, tot
          |WHERE val * n * 2 > t * 3
          |ORDER BY val DESC, partkey""".stripMargin))
  )
}

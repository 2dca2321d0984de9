package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over corpus-derived graphs (§2.4, added r5).
  *
  * [[graft.queries.SimilarityQueries]]'s dedup_clusters covers the
  * connected-components family; this adds the PageRank family via TextRank
  * (Mihalcea & Tarau 2004): keyword extraction as PageRank over the
  * word-adjacency graph — the graph-centrality member of the
  * keyword/quality-scoring toolbox next to the frequency one
  * (tfidf_topterms).
  *
  * Float discipline (r8): every per-edge/per-node value lives on the
  * 6 dp decimal grid, entered via the engine-version-proof
  * `floor(x·10^6)/10^6 :: DECIMAL` (floor of a bit-identical double is a
  * pure function of its bits on any build, and the resulting double sits
  * ON a grid point, so the decimal cast is unambiguous on both engines —
  * unlike `round(double, 6)`, whose midpoint behavior varies across
  * builds); sums run over exact decimals (order-independent), and the
  * only double ops are correctly-rounded IEEE divisions/multiplications —
  * so five chained iterations stay bit-identical across engines.
  */
object GraphQueries {

  private val Damping = 0.85
  /** Written as the literal 0.15, NOT computed as 1.0 − 0.85 (= 0.1500…02
    * in binary): both engines must see the same double. In the SQL both
    * constants are wrapped in CAST(… AS DOUBLE) — DuckDB parses bare
    * decimal literals as DECIMAL and would otherwise run exact decimal
    * division where Spark runs double division. */
  private val OneMinusD = 0.15
  private val Iterations = 5
  private val TopK = 20
  /** triangle_count backbone-graph size — the analysis contract, not a
    * data-dependent cap: every post-corpus-pass structure is ≤ E edges. */
  private val TopEdges = 500

  /** The full PageRank frame (id, pr DECIMAL(12,6)) over a near-dup pair
    * frame — dup_graph_pagerank's loop, factored r14 so
    * dedup_policy_compare's `pagerank_hub` policy provably ranks with the
    * SAME 5 damped exact-decimal iterations the audit query reports
    * (textrank's float discipline verbatim; see the object doc). Caller
    * supplies a lineage-truncated (a_id, b_id) pair frame. */
  private[queries] def dupPagerankFrom(pairs: DataFrame): DataFrame = {
    val sym = pairs.union(pairs.select(col("b_id"), col("a_id")))
    val outw = sym.groupBy("a_id").agg(count(lit(1)).as("outw"))
    // r15 (guide §2.6): the two independent checkpoint barriers overlap
    val Seq(shared, nodes) = Q.truncatePar(Seq(
      sym.join(outw, Seq("a_id"))
        .select(col("a_id"), col("b_id"),
          Q.grid6(lit(1.0) / col("outw")).cast("decimal(10,6)").as("share")),
      sym.select(col("a_id").as("id")).distinct()))
    val ncount = nodes.agg(count(lit(1)).as("n"))
    def iterate(pr: DataFrame): DataFrame = {
      val contrib = pr.join(shared, pr("id") === shared("a_id"))
        .select(col("b_id").as("id"),
          Q.grid6(col("pr").cast("double") * col("share").cast("double"))
            .cast("decimal(12,6)").as("c"))
        .groupBy("id").agg(sum(col("c")).as("acc"))
      nodes.crossJoin(broadcast(ncount)).join(contrib, Seq("id"), "left")
        .select(col("id"),
          Q.grid6(
            lit(OneMinusD) / col("n") +
              lit(Damping) * coalesce(col("acc"), lit(0).cast("decimal(12,6)")).cast("double"))
            .cast("decimal(12,6)").as("pr"))
    }
    var pr: DataFrame = nodes.crossJoin(broadcast(ncount))
      .select(col("id"),
        Q.grid6(lit(1.0) / col("n")).cast("decimal(12,6)").as("pr"))
    for (_ <- 1 to Iterations) pr = iterate(pr)
    pr
  }

  /** Oracle twin of [[dupPagerankFrom]] — CTE text from a `pairs(a_id,
    * b_id)` CTE through `prN(id, pr)`; `prFinalCte` names the last one.
    * CTE names are prefixed `pg` so callers can co-nest the CC and kcore
    * chains without collisions. */
  private[queries] def dupPagerankSqlCtes: String = {
    val base =
      s"""pgsym AS MATERIALIZED (
         |  SELECT a_id, b_id FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
         |pgoutw AS (SELECT a_id, COUNT(*) AS outw FROM pgsym GROUP BY a_id),
         |pgshared AS MATERIALIZED (
         |  SELECT s.a_id, s.b_id,
         |         CAST(floor(CAST(1 AS DOUBLE) / o.outw * 1000000.0) / 1000000.0
         |              AS DECIMAL(10,6)) AS share
         |  FROM pgsym s JOIN pgoutw o ON s.a_id = o.a_id),
         |pgnodes AS MATERIALIZED (SELECT DISTINCT a_id AS id FROM pgsym),
         |pgnc AS (SELECT COUNT(*) AS n FROM pgnodes),
         |pgpr0 AS (SELECT id,
         |            CAST(floor(CAST(1 AS DOUBLE) / n * 1000000.0) / 1000000.0
         |                 AS DECIMAL(12,6)) AS pr
         |          FROM pgnodes CROSS JOIN pgnc)""".stripMargin
    val iters = (1 to Iterations).map { i =>
      s"""pgpr$i AS MATERIALIZED (
         |  SELECT pgnodes.id,
         |         CAST(floor((CAST($OneMinusD AS DOUBLE) / pgnc.n +
         |           CAST($Damping AS DOUBLE) * CAST(COALESCE(s.acc, CAST(0 AS DECIMAL(12,6))) AS DOUBLE))
         |           * 1000000.0) / 1000000.0
         |           AS DECIMAL(12,6)) AS pr
         |  FROM pgnodes CROSS JOIN pgnc
         |  LEFT JOIN (SELECT sh.b_id AS id,
         |               SUM(CAST(floor(CAST(p.pr AS DOUBLE) * CAST(sh.share AS DOUBLE)
         |                   * 1000000.0) / 1000000.0
         |                   AS DECIMAL(12,6))) AS acc
         |             FROM pgpr${i - 1} p JOIN pgshared sh ON p.id = sh.a_id
         |             GROUP BY sh.b_id) s ON pgnodes.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters"
  }

  /** The last CTE name emitted by [[dupPagerankSqlCtes]]. */
  private[queries] def dupPagerankFinalCte: String = s"pgpr$Iterations"

  val all: Map[String, Q] = Map(

    // ---- TextRank keywords (PageRank over the bigram graph) --------------
    // Nodes = corpus vocabulary; directed edge a→b weighted by the adjacent
    // bigram count; share(a→b) = w/outw(a); 5 damped iterations
    // pr' = (1-d)/N + d·Σ_in round(pr·share, 6), uniform init. Dangling
    // tokens (no out-edges) leak their rank — the standard simplification,
    // identical on both engines. Scale shape: the expensive part is the ONE
    // corpus pass building bigram counts (explode + hash agg); the graph
    // itself is vocabulary-sized, so each iteration is a broadcastable
    // join + tiny agg — at 100 TB the corpus scan dominates and the
    // iterations are noise (the opposite profile of dedup_clusters, whose
    // graph is corpus-sized).
    "textrank_keywords" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val bigrams = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
        val edges = bigrams.groupBy("a", "b").agg(count(lit(1)).as("w"))
        val outw = edges.groupBy("a").agg(sum(col("w")).as("outw"))
        // CHECKPOINTED, not cached (r6): the iteration plan references
        // `shared` 5× and `nodes` 6×. Round 5 relied on ReusedExchange to
        // deduplicate the identical corpus subtrees inside the one job —
        // correct, but an AQE planning change could silently quintuple the
        // corpus passes with no test noticing. A checkpoint TRUNCATES the
        // plan: the corpus is scanned exactly once per frame, by
        // construction, and the iterations reference a vocabulary-sized
        // (KB-scale) materialized frame. This is NOT the measured .cache()
        // pathology (1.75 → 4.9 s at sf0.1): that cost came from
        // InMemoryRelation scans breaking whole-stage fusion around every
        // iteration join while the corpus subtrees STILL had to be planned
        // 5-6×; a checkpoint's truncated plan replaces those subtrees
        // outright (re-benched r6: no regression vs the ReusedExchange
        // form, and the corpus-scan count is now structural, not
        // optimizer-dependent).
        // r15 (guide §2.6): two independent checkpoint barriers overlapped
        val Seq(shared, nodes) = Q.truncatePar(Seq(
          edges.join(outw, Seq("a"))
            .select(col("a"), col("b"),
              Q.grid6(col("w").cast("double") / col("outw"))
                .cast("decimal(10,6)").as("share")),
          docs.select(explode(split(col("text"), " ")).as("tok")).distinct()))
        val ncount = nodes.agg(count(lit(1)).as("n"))
        def iterate(pr: DataFrame): DataFrame = {
          val contrib = pr.join(shared, pr("tok") === shared("a"))
            .select(col("b").as("tok"),
              Q.grid6(col("pr").cast("double") * col("share").cast("double"))
                .cast("decimal(12,6)").as("c"))
            .groupBy("tok").agg(sum(col("c")).as("acc"))
          nodes.crossJoin(broadcast(ncount)).join(contrib, Seq("tok"), "left")
            .select(col("tok"),
              Q.grid6(
                lit(OneMinusD) / col("n") +
                  lit(Damping) * coalesce(col("acc"), lit(0).cast("decimal(12,6)")).cast("double"))
                .cast("decimal(12,6)").as("pr"))
        }
        var pr: DataFrame = nodes.crossJoin(broadcast(ncount))
          .select(col("tok"),
            Q.grid6(lit(1.0) / col("n")).cast("decimal(12,6)").as("pr"))
        for (_ <- 1 to Iterations) pr = iterate(pr)
        // Global rank window over the ≤TopK-row post-limit frame — the
        // WindowExec single-partition warning it triggers is benign.
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("tok"))
        pr.orderBy(col("pr").desc, col("tok")).limit(TopK)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("tok"), col("pr").cast("double").as("pr"))
          .orderBy("rank")
      },
      oracle = Some {
        val base =
          """t AS (SELECT string_split(text, ' ') AS toks FROM documents),
            |bi AS (SELECT UNNEST(list_transform(range(len(toks) - 1),
            |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
            |       FROM t WHERE len(toks) >= 2),
            |edges AS (SELECT a, b, COUNT(*) AS w FROM bi GROUP BY a, b),
            |outw AS (SELECT a, SUM(w) AS outw FROM edges GROUP BY a),
            |shared AS (SELECT e.a, e.b,
            |             CAST(floor(CAST(e.w AS DOUBLE) / o.outw * 1000000.0) / 1000000.0
            |                  AS DECIMAL(10,6)) AS share
            |           FROM edges e JOIN outw o ON e.a = o.a),
            |nodes AS (SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok FROM documents),
            |nc AS (SELECT COUNT(*) AS n FROM nodes),
            |pr0 AS (SELECT tok,
            |          CAST(floor(CAST(1 AS DOUBLE) / n * 1000000.0) / 1000000.0
            |               AS DECIMAL(12,6)) AS pr
            |        FROM nodes CROSS JOIN nc)""".stripMargin
        val iters = (1 to Iterations).map { i =>
          s"""pr$i AS (
             |  SELECT nodes.tok,
             |         CAST(floor((CAST($OneMinusD AS DOUBLE) / nc.n +
             |           CAST($Damping AS DOUBLE) * CAST(COALESCE(s.acc, CAST(0 AS DECIMAL(12,6))) AS DOUBLE))
             |           * 1000000.0) / 1000000.0
             |           AS DECIMAL(12,6)) AS pr
             |  FROM nodes CROSS JOIN nc
             |  LEFT JOIN (SELECT sh.b AS tok,
             |               SUM(CAST(floor(CAST(p.pr AS DOUBLE) * CAST(sh.share AS DOUBLE)
             |                   * 1000000.0) / 1000000.0
             |                   AS DECIMAL(12,6))) AS acc
             |             FROM pr${i - 1} p JOIN shared sh ON p.tok = sh.a
             |             GROUP BY sh.b) s ON nodes.tok = s.tok)""".stripMargin
        }.mkString(",\n")
        s"""WITH $base,
           |$iters,
           |ranked AS (SELECT tok, pr,
           |             ROW_NUMBER() OVER (ORDER BY pr DESC, tok) AS rank
           |           FROM pr$Iterations)
           |SELECT CAST(rank AS INTEGER) AS rank, tok, CAST(pr AS DOUBLE) AS pr
           |FROM ranked WHERE rank <= $TopK ORDER BY rank""".stripMargin
      }),

    // ---- PageRank over the near-dup graph (added r13) ---------------------
    // textrank_keywords' PageRank lifted from the word graph to the DOC
    // near-dup graph (band-local pairs at 0.40, the cluster family): the
    // top-ranked docs are the TEMPLATE HUBS — the documents the most
    // near-duplicates orbit — which is the survivor a hub-and-spoke dedup
    // policy keeps (dup_graph_assortativity r < 0 says the graph IS
    // hub-and-spoke; this names the hubs). Same float discipline as
    // textrank verbatim: per-edge share = 1/deg on the 6 dp grid, 5 damped
    // iterations of exact-decimal sums, dangling leak, uniform init over
    // the PAIR-GRAPH nodes. Top-20 by (pr DESC, vec_id).
    //
    // Scale shape: the expensive stage is the shared spill-free pair
    // generator; the graph frames are checkpoint-truncated, so the 5
    // iterations run over pair-graph-sized frames — broadcastable joins,
    // noise next to the corpus pass at 100 TB.
    "dup_graph_pagerank" -> Q(
      fn = (s, dir) => {
        val (pairsRaw, sig) = SimilarityQueries.lshNearDupPairsBandLocalWithSig(
          Tables.load(s, dir, "embeddings"), 0.40)
        val pairs = Q.truncate(pairsRaw.select(col("a_id"), col("b_id")))
        sig.unpersist()
        val pr = dupPagerankFrom(pairs)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("id"))
        pr.orderBy(col("pr").desc, col("id")).limit(TopK)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("id").as("vec_id"),
            col("pr").cast("double").as("pr"))
          .orderBy("rank")
      },
      oracle = Some {
        val duckDot = (a: String, b: String) =>
          s"""list_reduce(list_transform(range(1, 65),
             |  i -> CAST($a[i] AS DOUBLE) * $b[i]), (acc, v) -> acc + v)""".stripMargin
        val base =
          s"""p0 AS MATERIALIZED (
             |  SELECT a_id, b_id FROM cand
             |  JOIN e x ON x.vec_id = a_id JOIN e y ON y.vec_id = b_id
             |  WHERE ${duckDot("x.embedding", "y.embedding")}
             |         / (sqrt(${duckDot("x.embedding", "x.embedding")}) * sqrt(${duckDot("y.embedding", "y.embedding")})) >= 0.40),
             |sym AS MATERIALIZED (
             |  SELECT a_id, b_id FROM p0 UNION ALL SELECT b_id, a_id FROM p0),
             |outw AS (SELECT a_id, COUNT(*) AS outw FROM sym GROUP BY a_id),
             |shared AS MATERIALIZED (
             |  SELECT s.a_id, s.b_id,
             |         CAST(floor(CAST(1 AS DOUBLE) / o.outw * 1000000.0) / 1000000.0
             |              AS DECIMAL(10,6)) AS share
             |  FROM sym s JOIN outw o ON s.a_id = o.a_id),
             |nodes AS MATERIALIZED (SELECT DISTINCT a_id AS id FROM sym),
             |nc AS (SELECT COUNT(*) AS n FROM nodes),
             |pr0 AS (SELECT id,
             |          CAST(floor(CAST(1 AS DOUBLE) / n * 1000000.0) / 1000000.0
             |               AS DECIMAL(12,6)) AS pr
             |        FROM nodes CROSS JOIN nc)""".stripMargin
        val iters = (1 to Iterations).map { i =>
          s"""pr$i AS MATERIALIZED (
             |  SELECT nodes.id,
             |         CAST(floor((CAST($OneMinusD AS DOUBLE) / nc.n +
             |           CAST($Damping AS DOUBLE) * CAST(COALESCE(s.acc, CAST(0 AS DECIMAL(12,6))) AS DOUBLE))
             |           * 1000000.0) / 1000000.0
             |           AS DECIMAL(12,6)) AS pr
             |  FROM nodes CROSS JOIN nc
             |  LEFT JOIN (SELECT sh.b_id AS id,
             |               SUM(CAST(floor(CAST(p.pr AS DOUBLE) * CAST(sh.share AS DOUBLE)
             |                   * 1000000.0) / 1000000.0
             |                   AS DECIMAL(12,6))) AS acc
             |             FROM pr${i - 1} p JOIN shared sh ON p.id = sh.a_id
             |             GROUP BY sh.b_id) s ON nodes.id = s.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${SimilarityQueries.lshPairsSqlCtes040},
           |$base,
           |$iters,
           |ranked AS (SELECT id, pr,
           |             ROW_NUMBER() OVER (ORDER BY pr DESC, id) AS rank
           |           FROM pr$Iterations)
           |SELECT CAST(rank AS INTEGER) AS rank, id AS vec_id, CAST(pr AS DOUBLE) AS pr
           |FROM ranked WHERE rank <= $TopK ORDER BY rank""".stripMargin
      }),

    // ---- triangle count / transitivity of the co-occurrence graph --------
    // The local-structure member of the graph toolbox (TextRank measures
    // centrality, dedup_clusters connectivity): how CLIQUISH is the word
    // co-occurrence graph? Undirected edges from adjacent bigrams
    // (a ≠ b, normalized least/greatest), restricted to the top-E edges by
    // count (ties broken on (u, v) — a total order, so the edge set is
    // deterministic on both engines). Triangles {x<y<z} counted once via
    // two equi-joins on the edge list; wedges Σ d(d−1)/2 from the degree
    // table; transitivity = 3·T / wedges as the one final division of
    // exact ints. Everything after the corpus pass is bounded by E, set by
    // the QUERY — the standard "backbone graph" analysis contract.
    //
    // Scale shape: the one expensive pass is the corpus bigram explode +
    // hash agg (textrank's plan); TakeOrderedAndProject keeps E rows; the
    // checkpoint truncates the corpus subtree so the 5 downstream
    // references (two join sides, the third edge probe, degrees, the edge
    // count) read the E-row frame, not the corpus. The 1-row scalar
    // products at the end are PlanGuard R1-whitelisted.
    "triangle_count" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val bi = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        val top = Q.truncate(bi.groupBy("u", "v").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("u"), col("v")).limit(TopEdges)
          .select("u", "v"))
        val e1 = top.select(col("u").as("x"), col("v").as("y"))
        val e2 = top.select(col("u").as("y"), col("v").as("z"))
        val e3 = top.select(col("u").as("x"), col("v").as("z"))
        val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
          .agg(count(lit(1)).as("n_triangles"))
        val deg = top.select(col("u").as("x"))
          .unionByName(top.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("d"))
        val wed = deg.agg(sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
        val ne = top.agg(count(lit(1)).as("n_edges"))
        ne.crossJoin(broadcast(tri)).crossJoin(broadcast(wed))
          .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
            when(col("n_wedges") === 0, lit(0.0))
              .otherwise((col("n_triangles") * 3).cast("double")
                / col("n_wedges").cast("double")).as("transitivity"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
           |bi AS (SELECT UNNEST(list_transform(range(len(toks) - 1),
           |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
           |       FROM t WHERE len(toks) >= 2),
           |e0 AS (SELECT least(a, b) AS u, greatest(a, b) AS v, COUNT(*) AS cnt
           |       FROM bi WHERE a <> b GROUP BY 1, 2),
           |top AS (SELECT u, v FROM e0 ORDER BY cnt DESC, u, v LIMIT $TopEdges),
           |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
           |        FROM top e1 JOIN top e2 ON e1.v = e2.u
           |             JOIN top e3 ON e3.u = e1.u AND e3.v = e2.v),
           |deg AS (SELECT x, COUNT(*) AS d
           |        FROM (SELECT u AS x FROM top UNION ALL SELECT v AS x FROM top)
           |        GROUP BY x),
           |wed AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg),
           |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM top)
           |SELECT n_edges, n_triangles, n_wedges,
           |       CASE WHEN n_wedges = 0 THEN 0.0
           |            ELSE CAST(n_triangles * 3 AS DOUBLE)
           |                 / CAST(n_wedges AS DOUBLE) END AS transitivity
           |FROM ne CROSS JOIN tri CROSS JOIN wed""".stripMargin))
  )
}

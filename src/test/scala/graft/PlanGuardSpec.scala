package graft

import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-regression guard: machine-checks the "plans you'd want at 100×" bar
  * over EVERY query in [[SparkEntry.queries]], so a scale-killer can't creep
  * back in unnoticed (the reference bar is the O(1) hot path of
  * BucketPriorityPartitioner.java:62-94 — nothing in this engine should be
  * worse than linear-with-good-constants per partition).
  *
  * Rules (each with its documented whitelist):
  *   R1 no CartesianProduct / BroadcastNestedLoopJoin — except queries whose
  *      nested-loop side is provably tiny (a broadcast of ≤k query points /
  *      centroids / a 5×25 demo cross join);
  *   R2 no global (empty-partitionSpec) Window unless its input subtree is
  *      bounded by a global limit ≤ [[MaxGlobalWindowRows]];
  *   R3 no Window partitioned ONLY by the low-cardinality routing column
  *      (`bucket`) over un-aggregated input — with a handful of buckets that
  *      is one reducer per bucket carrying the whole table (the round-3
  *      scale-killer, now fixed by salting in BucketRouting.route);
  *   R4 no shuffle Exchange feeding directly into another shuffle Exchange
  *      (a re-shuffle that a sane plan always fuses or reuses).
  *
  * AQE is disabled while BUILDING these plans (never executed) so every
  * Exchange is visible statically; production runs keep AQE on.
  */
class PlanGuardSpec extends SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  /** R2 bound: a global window is fine over ≤ this many rows. */
  private val MaxGlobalWindowRows = 10000

  /** R1 whitelist — nested-loop joins whose non-streamed side is provably
    * tiny at any corpus scale (size is set by the QUERY, not the data):
    *   - q_cross_join: the intended 5-region × 25-nation demo product;
    *   - similarity_topk / similarity_topk_agg: broadcast of the ≤5-row
    *     query-vector side against the corpus — the standard brute-force
    *     ANN baseline shape;
    *   - lsh_topk: same ≤5-row broadcast query side (bucketed candidates);
    *   - ivf_topk: broadcast of k=16 centroids for assignment + the tiny
    *     (queries × centroids) probe product.
    */
  private val nestedLoopOk: Set[String] =
    Set("q_cross_join", "similarity_topk", "similarity_topk_agg", "lsh_topk", "ivf_topk",
      "quantized_topk", // same ≤5-row broadcast query side as similarity_topk
      "unigram_logprob", // broadcast of the 1-row corpus-total aggregate
      "tfidf_topterms", // broadcast of the 1-row doc-count aggregate
      "sample_temperature", // broadcast of the 1-row min-source-count aggregate
      "textrank_keywords", // broadcast of the 1-row node-count aggregate (×6 iterations)
      "dup_graph_pagerank", // same 1-row node-count broadcast ×6 (textrank's shape, r13)
      "kmeans_step", // broadcast of the 16-row centroid codebook (assignment product)
      "kmeans_train", // same ≤16-row centroid broadcast, once per Lloyd round (×3)
      "mix_weights", // broadcasts of the 1-row token-total and 1-row weight-sum aggregates
      "bm25_topk", // broadcast of the 1-row (n_docs, n_toks) corpus-stats aggregate
      "pmi_top_pairs", // broadcasts of the 1-row bigram-total and token-total aggregates
      "semdedup", // broadcast of the 16-row centroid codebook (assignment product)
      "resample_locf", // broadcast of the 1-row calendar-bounds aggregate
      "q11_important_stock", // broadcast of the 1-row (total, count) threshold aggregate
      "skew_profile", // broadcasts of the two 1-row top-10-share aggregates
      "dsir_weights", // broadcast of the 1-row corpus-stats aggregate
      "quality_buckets", // broadcast of the 1-row vocab-total aggregate (×2 consumers)
      "token_budget_plan", // 1-row token-total (×2 consumers) + 1-row weight-sum broadcasts
      "source_kl", // broadcast of the 1-row corpus-grand-total aggregate
      "rrf_fusion", // broadcast of the ≤5-row query-vector side (similarity_topk shape)
      "recall_at_k", // composes similarity_topk + ivf_topk legs — their whitelisted broadcasts
      "retrieval_mrr", // same composition as recall_at_k — the retrievers' whitelisted broadcasts
      "rbo_rankings", // same composition as recall_at_k — the retrievers' whitelisted broadcasts
      "type_drift", // broadcast of the 1-row grand-total aggregate (source_kl shape)
      "curriculum_schedule", // composes quality_buckets — its whitelisted 1-row broadcast
      "quality_dup_profile", // composes quality_buckets — same whitelisted 1-row broadcast
      "skipgram_pmi", // broadcasts of the 1-row pair-total and token-total aggregates
      "cluster_source_mix", // broadcast of the 16-row centroid codebook (kmeans_step shape)
      "hard_negatives", // broadcast of the ≤5-row query-vector side (similarity_topk shape)
      "hard_negatives_agg", // same ≤5-row query broadcast + the ≤q·NegHi ranked-frame broadcast
      "source_lang_chi2", // S×L contingency grid from the marginals (≤ 20×5) + 1-row total broadcasts
      "ndcg_eval", // composes the retrievers — their whitelisted ≤5-row query-side broadcasts
      "map_eval", // same composition — the retrievers' whitelisted broadcasts
      "ks_source_lengths", // broadcast of the 1-row (N1, N2) totals aggregate
      "triangle_count", // product of the three 1-row scalar aggregates (edges/triangles/wedges)
      "basket_lift", // broadcast of the 1-row basket-total aggregate
      "source_lang_mi", // broadcast of the 1-row grand-total aggregate (source_kl shape)
      "heldout_bigram_ppl", // broadcast of the 1-row train-vocab-size aggregate
      "interp_bigram_ppl", // broadcast of the 1-row train-unigram-total aggregate
      "vocab_coverage", // broadcast of the 1-row (total, n_vocab) aggregate
      "heaps_law_fit", // two broadcasts of the 1-row max-doc-id bound (bucketing both passes)
      "kn_bigram_ppl", // broadcast of the 1-row bigram-type-count aggregate
      "ivf_balance", // 16-row codebook broadcast (ivf_topk shape) + 1-row total aggregate
      "retention_halflife", // broadcast of the 1-row user-total aggregate
      "attribution_markov", // 1-row coefficient pivot × the 5-row VALUES variant dimension
      "token_burstiness", // broadcast of the 1-row doc-count aggregate
      "good_turing_smoothing", // broadcast of the 1-row (n_tokens, n1) totals aggregate
      "matryoshka_recall", // ≤5-row query-side broadcast ×4 prefixes (similarity_topk shape)
      "cluster_modularity", // broadcast of the 1-row total-edge-count aggregate
      "cuped_adjustment", // broadcast of the 1-row calendar-bounds aggregate
      // otsu_quality_threshold: ≤101-row band frame × the 1-row totals
      "otsu_quality_threshold",
      // theil_u_source_lang: 1-row grand-total broadcasts (source_kl /
      // source_lang_mi shape) onto the ≤S·L / ≤L / ≤S marginal frames
      "theil_u_source_lang",
      // permutation_entropy: ≤27-row pattern frame × the 1-row T broadcast
      "permutation_entropy",
      // ivf_pq_topk: ≤5-row query × 16-row centroid probe broadcasts
      // (ivf_topk's shape) + the 16-row PQ codebook broadcast
      "ivf_pq_topk",
      // ivf_pq_refined_topk: composes ivf_pq_topk's whitelisted broadcasts
      // + the ≤q×50 ADC-shortlist side joined back on vec_id (r13)
      "ivf_pq_refined_topk",
      // recall_pq_family: composes the four PQ retrievers — their
      // whitelisted query/centroid/codebook broadcasts (r13, +residual r14)
      "recall_pq_family",
      // ivf_pq_residual_topk: ivf_pq_topk's ≤5-row query × 16-row centroid
      // probe broadcasts + the ≤q×4-probe residual-ADC broadcast (r14)
      "ivf_pq_residual_topk",
      // ivf_pq_residual_refined_topk: composes the residual retriever's
      // whitelisted broadcasts + the refine stage's ≤q×50 shortlist (r14)
      "ivf_pq_residual_refined_topk",
      // dedup_policy_compare: composes dup_graph_pagerank's whitelisted
      // nodes × 1-row node-count broadcast (r14)
      "dedup_policy_compare",
      // ivf_trained_topk / ivf_spherical_topk: kmeans_train's ≤16-row
      // trained-centroid broadcast (assignment + per-round Lloyd products)
      // + the ≤5-row query probe product (ivf_topk's shape, r14)
      "ivf_trained_topk",
      "ivf_spherical_topk",
      // ivf_trained_recall: composes the three coarse retrievers — their
      // whitelisted centroid/query broadcasts (r14)
      "ivf_trained_recall",
      // ivf_sampled_topk / ivf_sampled_recall: the SAME ivfL2Serve tail as
      // ivf_trained_topk — ≤16-row trained-centroid broadcast (assignment +
      // Lloyd products over the hash-sample) + ≤5-row query probe product (r15)
      "ivf_sampled_topk",
      "ivf_sampled_recall",
      // ivf_pq_served_topk: the persisted-index serve — 16-row loaded
      // centroid broadcast (probe product) + the gated refine tail's
      // whitelisted ≤q×50 shortlist broadcasts (r15)
      "ivf_pq_served_topk",
      // bpe_apply: 1-row totals × 1-row vocab-size aggregate product (r13)
      "bpe_apply",
      // bpe_token_freq: 1-row token-total broadcast onto the post-limit
      // ≤20-row frame (r13)
      "bpe_token_freq",
      // pipeline_curation: the otsu 1-row cutoff broadcast (r13 — the
      // quota/cutoff precedent)
      "pipeline_curation",
      // hodges_lehmann_shift: grid x broadcast-grid difference product —
      // both sides value-domain bounded (n_chars grids), never corpus rows
      "hodges_lehmann_shift",
      // levene_bf_test: 1-row grand-total broadcast for the global mean
      "levene_bf_test",
      // simpson_paradox_check: 1-row pooled-2x2 broadcast onto ≤|sources|
      "simpson_paradox_check",
      // t_closeness_audit: cells x broadcast value-domain grid (calendar x
      // type cells, ingest-contract sens domain) + the 1-row totals
      "t_closeness_audit",
      // changepoint_daily: 1-row totals broadcast + the exact-argmax
      // anti-join whose BOTH sides are the day-grain aggregate (calendar-
      // span bounded by construction, never corpus rows)
      "changepoint_daily",
      // emd_source_lengths: ≤|sources| totals × broadcast length-domain
      // grid (the merged-grid expansion) + the 1-row corpus-total broadcast
      "emd_source_lengths",
      // benford_first_digit: 9-row digit spine × the 1-row total broadcast
      "benford_first_digit",
      // greedy_source_cover: ≤3-row picks × the 1-row grand-total broadcast
      "greedy_source_cover",
      // log_odds_keyness: 1-row grand-total broadcast (source_kl shape)
      "log_odds_keyness",
      // hill_tail_index: top-101 frame × the 1-row threshold broadcast
      "hill_tail_index",
      // negsample_table: vocab frame × the 1-row weight-sum broadcast
      "negsample_table",
      // attribution_position: ≤|types| credit agg × the 1-row total broadcast
      "attribution_position",
      // temporal_split_audit: the 1-row cut-day broadcast onto the event side
      "temporal_split_audit",
      // interleave_schedule: ≤|sources| weights × the 1-row total broadcast
      "interleave_schedule",
      // theil_decomposition: 1-row grand-total broadcasts (doc + source tiers)
      "theil_decomposition",
      // embedding_isotropy: 64-row dim-sum frame × the 1-row norm broadcast
      "embedding_isotropy",
      // psi_length_parity: bin grid × the 1-row smoothed-totals broadcast
      "psi_length_parity",
      // quality_rank_parity: ≤|sources| rank-sum agg × the 1-row N broadcast
      "quality_rank_parity",
      // knn_label_consistency: the shared ivfLists 16-centroid broadcast
      "knn_label_consistency",
      // ivf_probe_curve: composes similarity_topk + three probe variants of
      // the IVF leg — their whitelisted ≤5-row query / 16-row centroid
      // broadcasts (recall_at_k shape ×3)
      "ivf_probe_curve",
      // markov_stationary: the 1-row event-total broadcast onto the
      // ≤|types| state spine
      "markov_stationary",
      // pareto_user_share: the 1-row (n, total) broadcast onto the ranked
      // payer frame
      "pareto_user_share",
      // lifecycle_states: the 1-row max-week broadcast (right-censoring cut)
      "lifecycle_states",
      // cluster_purity: the 16-row codebook broadcast (kmeans_step shape)
      "cluster_purity",
      // silhouette_positive_share: the same 16-row codebook broadcast
      "silhouette_positive_share",
      // source_separability: 1-row V/N broadcasts into the constants frame
      // + the ≤|sources| NB-constants broadcast against the per-doc frame
      // (the dense doc×source score grid — 20-row side, map-side product)
      "source_separability",
      // dup_degree_profile: the 1-row corpus-count aggregate × the 1-row
      // touched-count aggregate (both sides are single-row by
      // construction — the zero-degree remainder row)
      "dup_degree_profile",
      // rfm_segments: the 1-row max-day / n / tercile-cutoff broadcasts
      "rfm_segments",
      // reciprocal_nn_rate: the shared ivfLists 16-centroid broadcast
      // (knn_label_consistency shape) + the 1-row totals × 1-row
      // reciprocal-count product
      "reciprocal_nn_rate",
      // coreset_kcenter: the kmeans_train unrolled-rounds discipline —
      // 1-row pick/center broadcasts per greedy round (×2) + the 1-row
      // radius aggregate
      "coreset_kcenter",
      // cliffs_delta_length: the 1-row totals broadcast (ks_source_lengths
      // shape)
      "cliffs_delta_length",
      // isotonic_calibration: inequality self-joins over the ≤11-row band
      // prefix frame (the PAV minimax grid — constant-size by construction)
      "isotonic_calibration",
      // burrows_delta: the 50-row top-vocab broadcast × the ≤|sources|
      // totals frame (the dense grid), plus the vocab broadcast onto the
      // token stream
      "burrows_delta",
      // churn_hazard_by_tenure: the 1-row max-week broadcast
      // (lifecycle_states' right-censoring cut)
      "churn_hazard_by_tenure",
      // best_split_length_dup: the 1-row (N, P) totals broadcast onto the
      // candidate grid
      "best_split_length_dup")

  // One analysis+optimization pass per query, shared by every rule below.
  // Plans are built, never executed (dedup_clusters' builder runs its own
  // tiny convergence jobs — that's its documented construction cost).
  //
  // KNOWN BLIND SPOT: dedup_clusters' returned plan reads a localCheckpoint,
  // which severs the LSH pair pipeline and the per-round CC join/agg plans
  // from the final executedPlan — R1-R4 cannot see inside the loop. The
  // expensive interior is therefore guarded EXPLICITLY: the shared pair
  // pipeline is added to `plans` below under a synthetic name, and
  // SimilarityQueriesSpec asserts its no-cartesian property independently.
  private lazy val plans: Map[String, SparkPlan] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val queryPlans = SparkEntry.queries.map { case (name, fn) =>
        name -> fn(spark, SfDir).queryExecution.executedPlan
      }
      val pairPipeline = graft.queries.SimilarityQueries
        .lshNearDupPairs(Tables.load(spark, SfDir, "embeddings"), 0.40)
      queryPlans + ("__dedup_clusters_pair_pipeline" ->
        pairPipeline.queryExecution.executedPlan)
    }
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.catalog.clearCache() // the pair pipeline caches its signatures
    }
  }

  /** All nodes of the plan including subquery plans. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case n => n }

  /** Is this window's input bounded by a global limit ≤ k rows? Walks the
    * DIRECT unary chain below the window only — a limit hiding on one
    * branch of a join (e.g. a broadcast dim.limit(20) under an unbounded
    * fact scan) must NOT qualify, since the window still sees the unbounded
    * side's rows. */
  private def limitBounded(w: WindowExec): Boolean = {
    var node: SparkPlan = w.child
    while (node.children.size == 1) {
      node match {
        case g: GlobalLimitExec if g.limit <= MaxGlobalWindowRows => return true
        case t: TakeOrderedAndProjectExec if t.limit <= MaxGlobalWindowRows => return true
        case _ =>
      }
      node = node.children.head
    }
    node match {
      case t: TakeOrderedAndProjectExec if t.limit <= MaxGlobalWindowRows => true
      case _ => false
    }
  }

  /** Does the window's input subtree aggregate (rows already reduced to
    * group cardinality) before the window runs? Resolves ReusedExchange
    * indirection (a reused exchange is a leaf whose real subtree lives on
    * the original branch — changepoint_daily's argmax consumes the same
    * day-grain shuffle three times). */
  private def aggregated(w: WindowExec): Boolean = {
    def walk(p: SparkPlan): Boolean =
      if (p.nodeName.contains("Aggregate")) true
      else p match {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case _ => p.children.exists(walk)
      }
    walk(w.child)
  }

  test("R1: no cartesian products or nested-loop joins outside the tiny-side whitelist") {
    val offenders = plans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      if (nestedLoopOk(name)) Nil
      else nodes(p).collect {
        case j: CartesianProductExec => s"$name: ${j.nodeName}"
        case j: BroadcastNestedLoopJoinExec => s"$name: ${j.nodeName}"
      }
    }
    assert(offenders.isEmpty, s"cartesian/nested-loop joins found:\n${offenders.mkString("\n")}")
  }

  test("R1b: whitelisted queries still exist (stale whitelist guard)") {
    val gone = (nestedLoopOk ++ globalWindowOk).filterNot(SparkEntry.queries.contains)
    assert(gone.isEmpty, s"whitelist names no longer in SparkEntry.queries: $gone")
  }

  /** R2 whitelist — global windows whose input cardinality is bounded by the
    * QUERY's construction rather than a literal limit (which the static
    * walk in [[limitBounded]] can prove):
    *   - shuffle_deterministic: the per-shard offset window runs over the
    *     16-row output of the hex-prefix aggregate (group key =
    *     substring(md5, 1, 1), domain ≤ 16 by construction — the whole
    *     point of the stitched rank is that ONLY this 16-row frame is
    *     single-reducer, never the corpus).
    */
  private val globalWindowOk: Set[String] = Set("shuffle_deterministic",
    // curriculum_schedule: same stitch — its offset window runs over the
    // ≤48-row (tercile × hex-prefix) aggregate, never the corpus.
    "curriculum_schedule",
    // auc_dup_quality / ks_source_lengths: the cumulative-rank / ECDF
    // window runs over the per-n_chars aggregate grid — cardinality is
    // bounded by the value DOMAIN of document length (an ingest contract),
    // never by corpus row count.
    "auc_dup_quality", "ks_source_lengths",
    // gini_source_tokens: rank window over the ≤|sources|-row aggregate.
    "gini_source_tokens",
    // survival_km: risk-set and log-survival cumulative windows over the
    // duration-day grid — day-domain bounded, never corpus rows.
    "survival_km",
    // heaps_law_fit: the two cumulative windows run over the 64-row
    // doc-id-bucket aggregate — the checkpoint grid is CONSTANT-size by
    // construction (that is the whole design: never a per-doc frame).
    "heaps_law_fit",
    // attribution_markov: base/total windows over the 5-row variant frame
    // (1-row coefficient pivot × the VALUES channel dimension).
    "attribution_markov",
    // changepoint_daily: prefix-sum window over the day-grain aggregate —
    // calendar-span bounded like survival_km.
    "changepoint_daily",
    // emd_source_lengths: corpus-CDF window over the per-length aggregate
    // grid — value-domain bounded like ks_source_lengths.
    "emd_source_lengths",
    // greedy_source_cover: cumulative window over the ≤3-row picks frame
    // (one argmax aggregate row per greedy round).
    "greedy_source_cover",
    // gini_user_revenue: the stitched-rank OFFSETS window over the
    // ≤|revenue-bucket| aggregate frame (value-domain bounded) — the
    // per-user rank windows are g-partitioned, never global.
    "gini_user_revenue",
    // quality_rank_parity: the same stitched-rank offsets window over the
    // ≤11-row quality-band aggregate frame.
    "quality_rank_parity",
    // kruskal_length_by_source: the midrank cumulative window over the
    // per-length value grid — value-domain bounded like ks_source_lengths.
    "kruskal_length_by_source",
    // spearman_length_quality: the n_chars midrank window (value-domain
    // grid) and the ≤11-row q6 band-offsets window — both aggregated.
    "spearman_length_quality",
    // rolling_active_users: the WAU rolling-set window runs over the
    // day-grain aggregate — calendar-span bounded like survival_km.
    "rolling_active_users",
    // markov_stationary: the uniform-start rank/count windows over the
    // DISTINCT-event-type aggregate — ≤|types| rows by construction.
    "markov_stationary",
    // pareto_user_share: the stitched-rank OFFSETS window over the
    // ≤|revenue-bucket| aggregate frame — gini_user_revenue's shape.
    "pareto_user_share",
    // classical_decomposition: the centered 7-day ROWS window over the
    // day-grain aggregate — calendar-span bounded like changepoint_daily.
    "classical_decomposition",
    // hodges_lehmann_shift: the weighted-median cumulative window over the
    // pairwise-DIFFERENCE grid — bounded by the n_chars difference domain,
    // never by pair count (pair mass rides DECIMAL weights).
    "hodges_lehmann_shift",
    // t_closeness_audit: the global-CDF window over the sens value grid —
    // value-domain bounded like emd_source_lengths.
    "t_closeness_audit",
    // granger_daily: the lag window over the two-series common-day frame —
    // calendar-span bounded like changepoint_daily.
    "granger_daily",
    // permutation_entropy: the lead window over the daily series —
    // calendar-span bounded like changepoint_daily.
    "permutation_entropy",
    // otsu_quality_threshold: the cumulative window over the ≤101-level
    // quality-band grid — constant-size by construction.
    "otsu_quality_threshold",
    // pipeline_curation: contains the same otsu ≤101-band cumulative
    // window (r13 — the derived cutoff).
    "pipeline_curation",
    // rfm_segments: three tercile-cutoff cumulative windows, each over a
    // value-domain-bounded grid (recency days / frequency values /
    // monetary cents sums) — the auc_dup_quality argument ×3.
    "rfm_segments",
    // cliffs_delta_length: ONE cumulative window over the merged length
    // grid — the ks_source_lengths argument.
    "cliffs_delta_length",
    // isotonic_calibration: the band prefix window over the ≤11-row
    // quality-band aggregate (quality_rank_parity's bound).
    "isotonic_calibration",
    // seasonal_strength: classical_decomposition's centered day-grain
    // window — calendar-span bounded.
    "seasonal_strength",
    // churn_hazard_by_tenure: the descending risk-set window over the
    // ≤calendar-weeks tenure aggregate (survival_km's argument).
    "churn_hazard_by_tenure",
    // best_split_length_dup: the candidate-threshold cumulative window
    // over the length value grid — auc_dup_quality's argument.
    "best_split_length_dup",
    // mann_whitney_length: ONE cumulative window over the merged length
    // grid — cliffs_delta_length's argument (it reuses the same grid).
    "mann_whitney_length",
    // sprt_conversion: the LLR prefix-sum window over the day-grain
    // aggregate — calendar-span bounded like changepoint_daily.
    "sprt_conversion")

  test("R2: global windows only over limit-bounded inputs") {
    val offenders = plans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      nodes(p).collect {
        // the whitelist only excuses a window that actually sits over an
        // aggregate (the bounded-by-construction shape) — an un-aggregated
        // global window in a whitelisted query still fails
        case w: WindowExec
            if w.partitionSpec.isEmpty && !limitBounded(w) &&
              !(globalWindowOk(name) && aggregated(w)) =>
          s"$name: global Window over unbounded input"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("R2b: whitelisted global windows carry no more rows than their documented bound source") {
    // R2's whitelist claims each global window is bounded "by construction"
    // — this test MEASURES that claim at the gate sf against the actual
    // bound SOURCE (hex-prefix domain, value domain of n_chars, source
    // count, calendar span, constant grid), so a data-shape change that
    // silently unbounds a whitelisted window fails here instead of
    // becoming a single-reducer scale-killer in production (r7 verdict
    // item 8).
    val docs = Tables.load(spark, SfDir, "documents")
    val events = Tables.load(spark, SfDir, "events")
    val nChars = docs.select("n_chars").distinct().count()
    val nSources = docs.select("source").distinct().count()
    val daySpan = events.agg(
      (org.apache.spark.sql.functions.datediff(
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts"))),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))) + 1).cast("long")).head().getLong(0)
    val revenueBuckets: Long = Tables.load(spark, SfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .groupBy("user_id")
      .agg((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("c"))
      .select(org.apache.spark.sql.functions.expr("c div 100000"))
      .distinct().count()
    val bounds: Map[String, Long] = Map(
      "shuffle_deterministic" -> 16L, // hex-prefix offset table
      "curriculum_schedule" -> 48L, // tercile × hex-prefix offsets
      "auc_dup_quality" -> (nChars + 2), // n_chars value-domain grid
      "ks_source_lengths" -> (2 * nChars + 2), // two sources' merged grids
      "gini_source_tokens" -> nSources, // per-source rank
      "survival_km" -> daySpan, // duration-day grid ≤ calendar span
      "heaps_law_fit" -> 64L, // constant checkpoint grid
      "attribution_markov" -> 5L, // 1-row coef pivot × the variant dimension
      "changepoint_daily" -> daySpan, // daily-volume series ≤ calendar span
      "emd_source_lengths" -> nChars, // corpus length-grid CDF window
      "hodges_lehmann_shift" -> { // distinct pairwise length differences
        val vs = docs.select("n_chars").distinct()
        vs.select(org.apache.spark.sql.functions.col("n_chars").as("v1"))
          .crossJoin(vs.select(org.apache.spark.sql.functions.col("n_chars").as("v2")))
          .select(org.apache.spark.sql.functions.expr("v1 - v2")).distinct().count()
      },
      "granger_daily" -> daySpan, // common-day two-series frame
      "permutation_entropy" -> daySpan, // daily total-volume series
      "otsu_quality_threshold" -> 101L, // q6 div 1e4 band grid
      "pipeline_curation" -> 101L, // the same otsu band-grid window (r13)
      "t_closeness_audit" -> // sens value-domain grid (floor(value))
        events.select(org.apache.spark.sql.functions.expr(
          "cast(floor(value) as long)")).distinct().count(),
      "greedy_source_cover" -> 3L, // one argmax row per greedy round
      "quality_rank_parity" -> 11L, // quality bands q6 div 1e5 ∈ 0..10
      "kruskal_length_by_source" -> nChars, // length value-domain grid
      "spearman_length_quality" -> nChars, // length grid (covers the ≤11-row band frame)
      "gini_user_revenue" -> revenueBuckets, // distinct revenue buckets (cents div 1e5)
      "rolling_active_users" -> daySpan, // per-day active-set frame
      "markov_stationary" -> // distinct event types (the state spine)
        events.select("event_type").distinct().count(),
      "pareto_user_share" -> revenueBuckets, // same bucket offsets frame as gini
      "classical_decomposition" -> daySpan, // centered MA over the daily series
      "cliffs_delta_length" -> (nChars + 2), // merged length grid
      "best_split_length_dup" -> (nChars + 2), // candidate-threshold grid
      "mann_whitney_length" -> (nChars + 2), // same merged length grid as cliffs
      "sprt_conversion" -> daySpan, // LLR prefix over the daily series
      "seasonal_strength" -> daySpan, // centered MA over the daily series
      "churn_hazard_by_tenure" -> (daySpan / 7 + 2), // tenure-week grid
      "isotonic_calibration" -> 11L, // quality bands q6 div 1e5 ∈ 0..10
      "rfm_segments" -> { // max of the three tercile value grids
        val purch = Tables.load(spark, SfDir, "events")
          .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(org.apache.spark.sql.functions.max(
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ts"))).as("lastd"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("f"),
            (org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("value").cast("decimal(18,2)")) * 100)
              .cast("long").as("m"))
        Seq(purch.select("lastd").distinct().count(),
          purch.select("f").distinct().count(),
          purch.select("m").distinct().count()).max
      })
    assert(bounds.keySet == globalWindowOk,
      s"whitelist and bound claims out of lockstep: ${bounds.keySet.diff(globalWindowOk)} / ${globalWindowOk.diff(bounds.keySet)}")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try bounds.toSeq.sortBy(_._1).foreach { case (name, bound) =>
      val df = SparkEntry.queries(name)(spark, SfDir)
      df.queryExecution.toRdd.count()
      // measure exactly the windows the whitelist excuses (aggregated,
      // not limit-bounded) — a limit-bounded rank window in a composed
      // query is R2-legal on its own terms and claims no bound here
      val ws = nodes(df.queryExecution.executedPlan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w) && aggregated(w) => w
      }
      assert(ws.nonEmpty, s"$name: no whitelist-shaped global window found (stale whitelist?)")
      ws.foreach { w =>
        // WindowExec itself exposes no row metric (Spark 4): walk the
        // unary chain below it (sort/project/exchange all preserve row
        // count) to the first node that does — the aggregate whose output
        // IS the window's input cardinality
        var node: SparkPlan = w.child
        while (node.metrics.get("numOutputRows").isEmpty &&
          (node.children.size == 1 ||
            node.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec]))
          node = node match {
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r.child
            case n => n.children.head
          }
        val n = node.metrics.get("numOutputRows").map(_.value).getOrElse(
          fail(s"$name: no numOutputRows metric found below the global window " +
            s"(stopped at ${node.nodeName})"))
        assert(n <= bound, s"$name: global window carried $n rows > documented bound $bound")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.catalog.clearCache()
    }
  }

  test("R3: no bucket-only window over un-aggregated input (routing scale-killer)") {
    val offenders = plans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      nodes(p).collect {
        case w: WindowExec
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.references.map(_.name).forall(_ == "bucket")) &&
              !aggregated(w) =>
          s"$name: Window partitioned only by `bucket` over raw input"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("R3 negative control: the guard fires on the pre-round-4 bucket-only window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the shape route() shipped before salting: row_number over a window
      // partitioned by the low-cardinality bucket column on raw rows
      val df = Tables.load(spark, SfDir, "events")
        .withColumn("bucket", col("event_type"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("event_id"))))
      val bad = nodes(df.queryExecution.executedPlan).collect {
        case w: WindowExec
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.references.map(_.name).forall(_ == "bucket")) &&
              !aggregated(w) => w
      }
      assert(bad.nonEmpty, "guard failed to flag a bucket-only window over raw input")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("R4: no shuffle exchange feeding directly into another shuffle exchange") {
    val offenders = plans.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      nodes(p).collect {
        case e: ShuffleExchangeLike if e.children.exists(_.isInstanceOf[ShuffleExchangeLike]) =>
          s"$name: Exchange directly under Exchange"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

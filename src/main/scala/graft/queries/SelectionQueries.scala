package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-SELECTION operators for training-set construction (round 7): which
  * documents to keep, how to weight them, how to order them, and how to
  * split them — the decision layer that sits on top of the §2.4 curation
  * verbs. Each derives from a published method:
  *
  *   - `dsir_weights`       — Data Selection via Importance Resampling
  *                            (Xie et al. 2023): per-doc log importance
  *                            ratio of a target-domain LM vs the raw-corpus
  *                            LM over bag-of-token features.
  *   - `quality_buckets`    — CCNet-style (Wenzek et al. 2020) per-language
  *                            head/middle/tail terciles by corpus-relative
  *                            unigram log-likelihood (the perplexity proxy).
  *   - `dup_ngram_ratio`    — per-doc duplicated-text diagnostic in the
  *                            spirit of Lee et al. 2022 ("Deduplicating
  *                            Training Data Makes Language Models Better"):
  *                            the fraction of a doc's 5-gram occurrences
  *                            that also occur in some OTHER document.
  *   - `shuffle_deterministic` — seeded, reproducible global training order
  *                            via hash permutation, ranked WITHOUT a global
  *                            single-reducer sort.
  *   - `train_split`        — deterministic hash-based train/val/test
  *                            assignment, audited per source.
  *   - `source_overlap`     — pairwise cross-source 5-gram Jaccard matrix
  *                            (the Dodge et al. 2021 datacard overlap
  *                            table): which sources duplicate each other.
  *   - `token_budget_plan`  — epoch allocation at a fixed token budget
  *                            under the mix_weights mixture (Muennighoff
  *                            et al. 2023): flags over-repeated sources.
  *   - `gopher_rules`       — Gopher-style boolean quality rule gates
  *                            (Rae et al. 2021 §A.1.1): word count bounds,
  *                            mean word length, alpha-word fraction, symbol
  *                            ratio, stopword floor — every comparison done
  *                            in exact integer arithmetic (cross-multiplied
  *                            ratios), so there is no float surface at all.
  *   - `source_kl`          — per-source unigram KL divergence to the corpus
  *                            distribution: how distinctive each domain is,
  *                            the quantitative input to mixture re-weighting
  *                            (the D_KL(p_s ‖ p_corpus) column of a
  *                            datacard).
  *
  * Float parity follows the r8 engine-version-proof doctrine (see
  * [[Queries]] scaladoc): every ln comes from [[LnGrid]]'s fixed-point
  * integer chain, square roots from [[Q.isqrt]], ratios from integer
  * `div` grids or `floor(x·10^6)` of IEEE-deterministic doubles; sums are
  * exact int64/decimal, and every emitted double is ONE bare
  * correctly-rounded op (a cast or a division).
  */
object SelectionQueries {

  /** ab_srm_check's per-cell χ² term over the (n, o_cell) sufficient
    * statistics: the difference 256·obs − n·w is exact int64 (safe to
    * n ≈ 3.6e16 docs), cast to double BEFORE squaring — for a grossly
    * broken split the difference reaches ~256·n, whose int64 square wraps
    * at n ≈ 1.2e8, exactly when the gate must fire (ADVICE r10). Shared
    * with R12BatchSpec's synthetic 1e8-row sufficient-statistics sweep so
    * the spec exercises the production expression verbatim. */
  private[graft] def srmTerm(o: Column, w: Long): Column = {
    val diff = (o * 256L - col("n") * w).cast("double")
    // denominator as double-first multiply: the int64 product n*(256*w)
    // wraps at n ~ 1.7e14 (w=204) — far below the difference's 3.6e16
    // bound (found by R12BatchSpec's sweep). For n < 2^53 both spellings
    // are the correctly-rounded double of the same exact integer, so the
    // hashed chi2 is bit-unchanged at every reachable corpus size; past
    // 2^53 the double-first form keeps going where int64 wraps.
    diff * diff / (col("n").cast("double") * lit((256L * w).toDouble))
  }


  /** The shared length x quality 2x2 sufficient statistics per source
    * (cmh_test / simpson_paradox_check): exposure = n_chars >= 200,
    * outcome = the Gopher stopword signal (>= 2 canonical stopwords) —
    * one map-side tokenize pass, then a per-source partial agg. Factored
    * so the stratified test and the per-stratum diagnostic can never
    * count their cells differently. */
  private[queries] def lenQuality2x2(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("source"),
        when(col("n_chars") >= 200, 1L).otherwise(0L).as("e"),
        when(expr(s"size(filter(toks, t -> t IN ($GopherStopSql))) >= 2"), 1L)
          .otherwise(0L).as("o"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("e")).as("n1"),
        sum(col("o")).as("m1"), sum(col("e") * col("o")).as("a"))

  /** Gopher's canonical "must contain ≥2 of" stopword list
    * (Rae et al. 2021 §A.1.1), quoted for both SQL surfaces. */
  private[queries] val GopherStopSql: String =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s"'$w'").mkString(", ")

  /** Otsu's between-class-variance argmax over the 101-level band grid of
    * the shared composite quality score — the 1-row frame behind
    * otsu_quality_threshold AND pipeline_curation's derived cutoff (r13:
    * the pipeline's hand-chosen 0.55 is now the documented FALLBACK dial;
    * the live threshold is this argmax), so the two surfaces provably
    * agree on where the data splits. */
  /** Per-document quality band g = q6 div 10⁴ ∈ 0..100 — the map-only
    * projection beneath [[otsuBand]] AND the streaming
    * [[graft.streaming.PriorityStreams.qualityBandStream]] twin, so the
    * live histogram and the batch argmax classify identically. */
  private[graft] def qualityBand(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_qstop",
        expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
      .withColumn("q6",
        floor((lit(0.4) * least(lit(1.0), col("n_words").cast("double") / 50.0) +
          lit(0.3) * (lit(1.0) - col("n_qstop").cast("double") / col("n_words")) +
          lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
          * 1000000.0).cast("long"))
      .select(expr("q6 div 10000").as("g"))

  private[queries] def otsuBand(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = qualityBand(docs).groupBy("g").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("c")).as("ww"), sum(col("g") * col("c")).as("mm"))
    val cand = hist
      .select(col("g"), sum(col("c")).over(w).as("w0"),
        sum(col("g") * col("c")).over(w).as("m0"))
      .crossJoin(broadcast(tot))
      .filter(col("w0") < col("ww"))
      .select(col("g"), col("w0"), col("m0"), col("ww"), col("mm"),
        expr("""((cast(m0 as decimal(38,0)) * (ww - w0)
               | - cast(mm - m0 as decimal(38,0)) * w0)
               | * (cast(m0 as decimal(38,0)) * (ww - w0)
               | - cast(mm - m0 as decimal(38,0)) * w0))
               | div (cast(w0 as decimal(38,0)) * (ww - w0))""".stripMargin)
          .as("score"))
    cand.agg(max(struct(col("score"), (-col("g")).as("ng"), col("w0"),
        col("m0"), col("ww"), col("mm"))).as("b"))
      .select((-col("b.ng")).as("best_band"),
        col("b.w0").as("n_below"), (col("b.ww") - col("b.w0")).as("n_above"),
        (col("b.m0").cast("double") / col("b.w0").cast("double")).as("mean_band_below"),
        ((col("b.mm") - col("b.m0")).cast("double")
          / (col("b.ww") - col("b.w0")).cast("double")).as("mean_band_above"),
        col("b.score").as("between_var_score"))
  }

  /** Oracle twin of [[otsuBand]] — CTE text ending in `best` (the 1-row
    * argmax), nested by otsu_quality_threshold and pipeline_curation. */
  private[queries] def otsuSqlCtes: String =
    s"""sc AS (
       |  SELECT CAST(floor((0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
       |       + 0.3 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
       |             w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
       |             AS DOUBLE) / len(string_split(text, ' ')))
       |       + 0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 200.0))
       |       * 1000000.0) AS BIGINT) // 10000 AS g
       |  FROM documents),
       |hist AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY g),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ww,
       |               CAST(SUM(g * c) AS BIGINT) AS mm FROM hist),
       |cum AS (SELECT g, CAST(SUM(c) OVER (ORDER BY g) AS BIGINT) AS w0,
       |               CAST(SUM(g * c) OVER (ORDER BY g) AS BIGINT) AS m0
       |        FROM hist),
       |cand AS (SELECT g, w0, m0, ww, mm,
       |                ((CAST(m0 AS HUGEINT) * (ww - w0)
       |                  - CAST(mm - m0 AS HUGEINT) * w0)
       |                 * (CAST(m0 AS HUGEINT) * (ww - w0)
       |                  - CAST(mm - m0 AS HUGEINT) * w0))
       |                // (CAST(w0 AS HUGEINT) * (ww - w0)) AS score
       |         FROM cum CROSS JOIN tot WHERE w0 < ww),
       |best AS (SELECT * FROM cand ORDER BY score DESC, g LIMIT 1)""".stripMargin

  /** Every selection entry except the composed curriculum below. */
  private val base: Map[String, Q] = Map(

    // ---- deterministic per-source reservoir sample (added r7) ------------
    // The bounded-size companion to sample_stratified's rate-based draw:
    // exactly k = 10 docs per source (fewer only if the source is smaller —
    // k chosen under the smallest SF's 25 docs/source so the sample
    // SELECTS at every gated scale rather than passing everything),
    // chosen as the k smallest seeded hashes — equivalent in distribution
    // to reservoir sampling but rerun-identical on any engine and any
    // partitioning (position = rank of md5(seed ∥ doc_id) within source,
    // doc_id tie-break). The audit/eyeball-sample primitive: "give me a
    // reproducible handful from every source". Zero float surface.
    //
    // Scale shape: the rank ≤ k filter compiles to Spark's WindowGroupLimit
    // pushdown — each map task keeps only its local top-k per source BEFORE
    // the exchange, so the shuffle carries ≤ k·|sources| rows per task, and
    // the per-source reducer sees ≤ k·|tasks| rows, never the corpus (the
    // hard_negatives plan; Explain-verified).
    "reservoir_sample" -> Q(
      fn = (s, dir) => {
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("skey"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5(concat(lit("rsv:42:"), col("doc_id").cast("string"))).as("skey"))
          .withColumn("rk", row_number().over(win))
          .filter(col("rk") <= 10)
          .select(col("source"), col("rk"), col("doc_id"))
          .orderBy("source", "rk")
      },
      oracle = Some(
        """WITH r AS (
          |  SELECT source, doc_id,
          |         ROW_NUMBER() OVER (PARTITION BY source
          |           ORDER BY md5('rsv:42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
          |  FROM documents)
          |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id
          |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // ---- DSIR importance weights (Xie et al. 2023) -----------------------
    // log w(doc) = (1/n) Σ_tok c_tok · [ln p_target(tok) − ln p_raw(tok)]
    // with add-1 smoothing over the raw vocabulary, target domain = the
    // English slice (stand-in for "Wikipedia-like" in the paper; any
    // predicate works). Docs with high weight look more target-like and
    // get resampled in.
    //
    // Scale shape: ONE corpus token agg carries BOTH counts — cr = count,
    // ct = conditional count over the target predicate — so there is no
    // raw⋈target vocab join at all; the vocab join back to (doc, tok)
    // counts is vocab-sized and deliberately un-hinted (broadcasts at
    // gate scale, shuffle-joins co-partitioned beyond the threshold, same
    // as tfidf); stats is a 1-row broadcast. No corpus-wide state beyond
    // the vocab — linear at 100 TB.
    //
    // ENGINE-VERSION-PROOF (r8 doctrine, Queries.scala): both smoothed lns
    // come from [[LnGrid]]'s fixed-point integer chain; the grid values
    // subtract EXACTLY as int64, × exact count c is exact, the int sum is
    // order-independent, and the final avg is one bare IEEE division by
    // the exact n·10^6.
    "dsir_weights" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy("tok").agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        val stats = vocab.agg(
          sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
          count(lit(1)).as("v"))
        val j0 = vocab.crossJoin(broadcast(stats))
        val j1 = LnGrid.withLn6(j0, col("ct") + 1L, col("tt") + col("v"), "lt6", "__dt_")
        val j2 = LnGrid.withLn6(j1, col("cr") + 1L, col("tr") + col("v"), "lr6", "__dr_")
        val scored = j2.select(col("tok"), (col("lt6") - col("lr6")).as("d6"))
        toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .join(scored, Seq("tok")) // un-hinted: vocab-sized (see tfidf)
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_tokens"),
            sum(col("d6") * col("c")).as("sd"))
          .select(col("doc_id"), col("n_tokens"),
            (col("sd").cast("double")
              / (col("n_tokens") * lit(1000000L)).cast("double")).as("dsir_logratio"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cr,
           |                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
           |          FROM t GROUP BY tok),
           |stats AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt,
           |                 CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
           |vj AS (SELECT tok, ct + 1 AS sm_t, tt + v AS den_t,
           |              cr + 1 AS sm_r, tr + v AS den_r FROM vocab, stats),
           |${LnGrid.sqlCtes("vj", "sm_t", "den_t", "lt6", "dt_")},
           |${LnGrid.sqlCtes("dt_out", "sm_r", "den_r", "lr6", "dr_")},
           |scored AS (SELECT tok, lt6 - lr6 AS d6 FROM dr_out),
           |dc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY doc_id, tok)
           |SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |       CAST(SUM(d6 * c) AS DOUBLE)
           |         / CAST(SUM(c) * 1000000 AS DOUBLE) AS dsir_logratio
           |FROM dc JOIN scored ON dc.tok = scored.tok
           |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin),
      headline = true),

    // ---- CCNet-style per-language quality terciles -----------------------
    // Rank each language's documents by corpus-relative avg unigram
    // log-likelihood (the unigram_logprob score — CCNet uses a KenLM
    // perplexity; the unigram LM is its order-1 case) and cut into
    // head/middle/tail terciles.
    //
    // Scale shape: `ntile(3) OVER (PARTITION BY lang ...)` would move each
    // whole language to ONE reducer — a scale-killer with ~30 languages at
    // 100 TB. Instead the rank is computed in two passes: documents group
    // by (lang, g) where g = floor(logprob) — integer-valued and therefore
    // CONTIGUOUS in the sort order — rank locally inside each (lang, g)
    // shard, and stitch shard offsets (a per-(lang, g) count aggregate,
    // tiny: #langs × #integer-logprob-values rows) into the global
    // per-lang rank. The tercile is then pure arithmetic on (rank, count)
    // reproducing SQL NTILE semantics exactly (first n%3 buckets take the
    // extra row). At finer skew, widen g to floor(logprob·10) — the
    // stitching is unchanged. NtileFormulaSpec pins the formula against
    // Spark's own ntile; the DuckDB oracle pins it cross-engine.
    //
    // ENGINE-VERSION-PROOF (r8): logprob is the rebuilt unigram_logprob
    // emission — [[LnGrid]] integer grid, exact int sum, one bare
    // division by the exact n·10^6; ORDER on bit-identical doubles is
    // bit-identical; floor() of one is exact.
    "quality_buckets" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        val total = vocab.agg(sum(col("n")).as("tt"))
        val v = LnGrid.withLn6(vocab.crossJoin(broadcast(total)),
            col("n"), col("tt"), "logp6")
          .select(col("tok"), col("logp6"))
        // lp has THREE consumers (shard rank, shard offsets, lang counts)
        // and ReuseCheck shows the corpus pipeline re-planned for each (13
        // scans) — but `.cache()` here measured ~40% SLOWER at sf0.1
        // (0.96 → 1.4 s warm; the textrank lesson again: InMemoryRelation
        // materialization + broken whole-stage fusion cost more than the
        // re-planned aggs, which are post-shuffle and cheap). At 100 TB
        // persist lp EXPLICITLY to storage between stages instead.
        val lp = toks.join(v, Seq("tok"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("nt"), sum(col("logp6")).as("sl"))
          .select(col("doc_id"), col("lang"),
            (col("sl").cast("double")
              / (col("nt") * lit(1000000L)).cast("double")).as("logprob"))
          .withColumn("g", floor(col("logprob")))
        // shard-local rank (descending logprob = best first) ...
        val rn = lp.withColumn("rn", row_number().over(
          Window.partitionBy("lang", "g")
            .orderBy(col("logprob").desc, col("doc_id"))))
        // ... + shard offsets. The offsets window runs over #langs ×
        // #distinct-floor(logprob) rows (tiny by construction) — the
        // per-lang frame is NOT single-partition-over-the-data.
        val offsets = lp.groupBy("lang", "g").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.partitionBy("lang").orderBy(col("g").desc)
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val counts = lp.groupBy("lang").agg(count(lit(1)).as("n"))
        rn.join(broadcast(offsets), Seq("lang", "g"))
          .join(broadcast(counts), Seq("lang"))
          .withColumn("r", col("off") + col("rn"))
          // SQL NTILE(3): base = n div 3, rem = n mod 3; first `rem`
          // buckets hold base+1 rows.
          .withColumn("bucket",
            when(col("r") <= (floor(col("n") / 3) + 1) * (col("n") % 3),
              floor((col("r") - 1) / (floor(col("n") / 3) + 1)) + 1)
              .otherwise(
                col("n") % 3 + floor(
                  (col("r") - (floor(col("n") / 3) + 1) * (col("n") % 3) - 1)
                    / floor(col("n") / 3)) + 1))
          .select(col("doc_id"), col("lang"), col("logprob"),
            when(col("bucket") === 1, "head")
              .when(col("bucket") === 2, "middle")
              .otherwise("tail").as("ppl_bucket"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c),
           |cj AS (SELECT tok, n, tt FROM c, tot),
           |${LnGrid.sqlCtes("cj", "n", "tt", "logp6", "qb_")},
           |lp AS (SELECT doc_id, lang,
           |              CAST(SUM(logp6) AS DOUBLE)
           |                / CAST(COUNT(*) * 1000000 AS DOUBLE) AS logprob
           |       FROM t JOIN qb_out USING (tok) GROUP BY doc_id, lang),
           |b AS (SELECT doc_id, lang, logprob,
           |             ntile(3) OVER (PARTITION BY lang ORDER BY logprob DESC, doc_id) AS bucket
           |      FROM lp)
           |SELECT doc_id, lang, logprob,
           |       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
           |FROM b ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- duplicated 5-gram occurrence ratio (Lee et al. 2022 diagnostic) -
    // For each doc: the fraction of its 5-gram OCCURRENCES (with
    // multiplicity) whose 5-gram also appears in at least one OTHER
    // document — the "how much of this doc is corpus-duplicated text"
    // signal that motivates substring-level dedup.
    //
    // Scale shape: occurrences carry md5 DIGESTS, never the 5-gram text, so
    // the shuffles stay narrow (the doc_fingerprint discipline); cross-doc
    // df is a two-level agg — (gram, doc) distinct then gram count — and
    // the df table joins back un-hinted (vocab-sized). "Appears in another
    // doc" = doc-frequency ≥ 2 OR (df = 1 AND the doc repeats it... no:
    // df counts DISTINCT docs, so df ≥ 2 exactly captures "some other doc
    // has it"). All counts exact ints; the ratio is one bare division.
    "dup_ngram_ratio" -> Q(
      fn = (s, dir) => {
        // One corpus explode collapsed straight to (doc, gram) counts; tf
        // serves BOTH the cross-doc df aggregate and the join back. df ≥ 2
        // over tf's (gram → row count) is exactly "distinct docs ≥ 2"
        // because tf is one row per (doc, gram); per-doc occurrence totals
        // are Σc, so nothing needs the raw occurrence stream again — the
        // df side aggregates ~2× fewer rows than the occurrence form it
        // replaced. `.cache()` on tf measured SLOWER (1.5 → 2.0 s at
        // sf0.1, the textrank lesson); at 100 TB persist tf explicitly.
        val tf = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(graft.functions.WindowMd5Functions
            .rollingWindowHashes(col("toks"), 5)).as("gh"))
          .groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
        // r16 (guide §2.4 "share one exchange"): df per gram = the row
        // count over the gh window of the SAME (doc, gh) frame — the old
        // agg-then-join-back re-executed the corpus 5-gram explode for the
        // df branch (partial agg before the exchange breaks canonical
        // equality, so runtime exchange reuse never fired; the
        // ngram_novelty/q2 window precedent). One corpus pass, one gh
        // exchange instead of two corpus-derived ones.
        tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_ngrams"),
            sum(when(col("df") >= 2, col("c")).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_ngrams"), col("n_dup"),
            (col("n_dup").cast("double") / col("n_ngrams")).as("dup_ratio"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |occ AS (SELECT doc_id,
          |               UNNEST(list_transform(range(len(toks) - 4),
          |                                     i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
          |        FROM d WHERE len(toks) >= 5),
          |df AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh)
          |SELECT occ.doc_id, COUNT(*) AS n_ngrams,
          |       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          |       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
          |FROM occ JOIN df USING (gh)
          |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin),
      headline = true),

    // ---- seeded deterministic global shuffle ------------------------------
    // Reproducible training order: position = rank of md5(seed ∥ doc_id)
    // — a fixed pseudorandom permutation any worker can recompute.
    //
    // Scale shape: a bare `row_number() OVER (ORDER BY k)` is a
    // single-reducer global sort — the classic scale-killer. Here the rank
    // is stitched: the first hex char of the key is a CONTIGUOUS prefix of
    // the key order, so ranking inside each of the 16 prefix shards and
    // adding per-shard offsets (a 16-row aggregate) reproduces the global
    // rank exactly. Widen the prefix to 2–3 chars (256/4096 shards) as the
    // corpus grows; the stitching is unchanged. Same construction as the
    // salted router window (BucketRouting.route).
    "shuffle_deterministic" -> Q(
      fn = (s, dir) => {
        val keyed = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat(lit("shuffle:42:"), col("doc_id").cast("string"))).as("k"))
          .withColumn("shard", substring(col("k"), 1, 1))
        val rn = keyed.withColumn("rn", row_number().over(
          Window.partitionBy("shard").orderBy(col("k"), col("doc_id"))))
        // 16-row offsets frame: the global-window warning does not apply
        // (≤16 rows by construction).
        val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.orderBy(col("shard"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        rn.join(broadcast(offsets), Seq("shard"))
          .select(col("doc_id"), (col("off") + col("rn")).as("pos"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id,
          |       row_number() OVER (ORDER BY md5(concat('shuffle:42:', CAST(doc_id AS VARCHAR))), doc_id) AS pos
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- deterministic training-shard manifest ----------------------------
    // The closing verb of dataset construction: plan the physical training
    // shards (fixed whitespace-token budget each, per source; 128 at gate
    // scale so shard boundaries are exercised at every sf — production
    // sets this to the real pack length × batch multiple) a data loader will
    // stream, with a content manifest per shard — doc/token counts and an
    // md5 over the ordered member doc ids, the identity a resumable loader
    // or a reproducibility audit checks against. Order within a source is
    // the seeded hash permutation (shuffle_deterministic's key), so the
    // manifest is a pure function of (corpus, seed): any worker, any day,
    // any cluster re-derives byte-identical shards. Zero float surface.
    //
    // r8 hash-gate insurance: this query was bitwise-green against the
    // local DuckDB yet hash-red on the driver's build with zero floats —
    // the remaining version-sensitive surface was RESULT DTYPE, not
    // values: DuckDB's window SUM(BIGINT) yields HUGEINT, and HUGEINT's
    // client-side representation (int vs float64 after fetch) varies by
    // build, which changes the driver's value hash even when every value
    // is equal. The oracle now pins `cum`, `shard_id`, and `n_docs` to
    // BIGINT explicitly so both engines emit identical int64 columns on
    // any build.
    //
    // Scale shape: the per-source token cumsum is NOT a single-reducer
    // window — the shuffle_deterministic stitch applied to SUMS: the first
    // hex char of the key is a contiguous prefix of the key order, so a
    // local cumsum inside each of the 16 (source, prefix) shards plus a
    // broadcast ≤16-row-per-source offset table reproduces the global
    // cumsum exactly (the oracle states the naive per-source window — row
    // equality proves the stitch). The manifest digest aggregates ordered
    // doc-id lists bounded by the shard size (~4096 tokens), never a whole
    // source.
    "shard_manifest" -> Q(
      fn = (s, dir) => {
        val target = 128L
        val keyed = Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("n_toks"),
            md5(concat(lit("shard:42:"), col("doc_id").cast("string"))).as("k"))
          .withColumn("pfx", substring(col("k"), 1, 1))
        val localCum = keyed.withColumn("lc",
          sum(col("n_toks")).over(Window.partitionBy("source", "pfx")
            .orderBy(col("k"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // ≤ 16 rows per source: the prefix totals stitch (broadcast). Each
        // shard's total IS its last local cumsum (max lc), so the offsets
        // share the window's definition rather than restating the sum.
        // Catalyst still plans the two consumers separately (column
        // pruning below the exchanges breaks canonical equality —
        // ReuseCheck: scans=4); at 100 TB persist `localCum` explicitly so
        // the corpus is tokenized once (the dup_ngram_ratio cache note).
        val offsets = localCum.groupBy("source", "pfx")
          .agg(max(col("lc")).as("t"))
          .withColumn("off",
            coalesce(sum(col("t")).over(Window.partitionBy("source")
              .orderBy(col("pfx")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("source", "pfx", "off")
        localCum.join(broadcast(offsets), Seq("source", "pfx"))
          .withColumn("cum", col("off") + col("lc"))
          .withColumn("shard_id", expr(s"(cum - n_toks) div $target"))
          .groupBy("source", "shard_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
            md5(array_join(transform(
              sort_array(collect_list(struct(col("k"), col("doc_id").cast("string").as("d")))),
              x => x.getField("d")), ",")).as("manifest_md5"))
          .orderBy("source", "shard_id")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
          |         md5(concat('shard:42:', CAST(doc_id AS VARCHAR))) AS k
          |  FROM documents),
          |c AS (
          |  SELECT source, doc_id, n_toks, k,
          |         CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY k, doc_id
          |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          |  FROM d)
          |SELECT source, CAST((cum - n_toks) // 128 AS BIGINT) AS shard_id,
          |       CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
          |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k, doc_id)) AS manifest_md5
          |FROM c GROUP BY source, shard_id
          |ORDER BY source, shard_id""".stripMargin)),

    // ---- Theil's U uncertainty coefficients: source <-> lang (r12) --------
    // The ASYMMETRIC association pair completing the chi2 (symmetric test)
    // / Cramér's V (symmetric effect) / MI (symmetric information) deck:
    // U(lang|source) = I/H(lang) is the SHARE of language uncertainty the
    // source explains, U(source|lang) the converse — they differ exactly
    // when the table is rectangular-skewed, and each is the actionable
    // number ("knowing source buys X% of the lang decision") that
    // symmetric measures can't give. Exact surface: I·n·10⁶ is
    // source_lang_mi's integer sum verbatim (shared LnGrid decomposition
    // ln(o·n/(r·c)) = ln6(o,r) + ln6(n,c)); H(lang)·n·10⁶ = −Σ c·ln6(c,n)
    // and H(source)·n·10⁶ = −Σ r·ln6(r,n) are the same grid over the
    // ≤L/≤S marginal frames; each U is ONE bare division of exact ints
    // (the common n·10⁶ scale cancels). Degenerate margins (H = 0, a
    // single class) report NULL.
    //
    // Scale shape: ONE (source, lang) corpus agg → everything after runs
    // over ≤ S·L rows; 1-row total broadcast (R1-whitelisted).
    "theil_u_source_lang" -> Q(
      fn = (s, dir) => {
        val o = Tables.load(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val r = o.groupBy("source").agg(sum(col("o")).as("r"))
        val c0 = o.groupBy("lang").agg(sum(col("o")).as("c"))
        val n = o.agg(sum(col("o")).as("n"))
        val j0 = o.join(r, Seq("source")).join(c0, Seq("lang")).crossJoin(broadcast(n))
        val j1 = LnGrid.withLn6(j0, col("o"), col("r"), "lor6", "__to_")
        val j2 = LnGrid.withLn6(j1, col("n"), col("c"), "lnc6", "__tn_")
        val mi = j2.select(col("o"), (col("lor6") + col("lnc6")).as("t6"))
          .agg(sum(expr("cast(o as decimal(38,0)) * t6")).as("mi6"),
            sum(col("o")).as("n"))
        val hl = LnGrid.withLn6(c0.crossJoin(broadcast(n)),
            col("c"), col("n"), "lcn6", "__tl_")
          .agg((-sum(expr("cast(c as decimal(38,0)) * lcn6"))).as("hl6"))
        val hs = LnGrid.withLn6(r.crossJoin(broadcast(n)),
            col("r"), col("n"), "lrn6", "__ts_")
          .agg((-sum(expr("cast(r as decimal(38,0)) * lrn6"))).as("hs6"))
        mi.crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
          .select(col("n").as("n_docs"),
            expr("cast(mi6 as bigint)").as("mi6"),
            expr("cast(hl6 as bigint)").as("h_lang6"),
            expr("cast(hs6 as bigint)").as("h_source6"),
            when(col("hl6") === 0, lit(null).cast("double"))
              .otherwise(col("mi6").cast("double") / col("hl6").cast("double"))
              .as("u_lang_given_source"),
            when(col("hs6") === 0, lit(null).cast("double"))
              .otherwise(col("mi6").cast("double") / col("hs6").cast("double"))
              .as("u_source_given_lang"))
      },
      oracle = Some(
        s"""WITH o AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
           |           FROM documents GROUP BY source, lang),
           |r AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY source),
           |c AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY lang),
           |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
           |j AS (SELECT o.o, r.r, c.c, n.n
           |      FROM o JOIN r USING (source) JOIN c USING (lang) CROSS JOIN n),
           |${LnGrid.sqlCtes("j", "o", "r", "lor6", "to_")},
           |${LnGrid.sqlCtes("to_out", "n", "c", "lnc6", "tn_")},
           |mi AS (SELECT SUM(CAST(o AS HUGEINT) * (lor6 + lnc6)) AS mi6,
           |              CAST(SUM(o) AS BIGINT) AS n
           |       FROM tn_out),
           |cl AS (SELECT c.c, n.n FROM c CROSS JOIN n),
           |${LnGrid.sqlCtes("cl", "c", "n", "lcn6", "tl_")},
           |hl AS (SELECT -SUM(CAST(c AS HUGEINT) * lcn6) AS hl6 FROM tl_out),
           |rl AS (SELECT r.r, n.n FROM r CROSS JOIN n),
           |${LnGrid.sqlCtes("rl", "r", "n", "lrn6", "ts_")},
           |hs AS (SELECT -SUM(CAST(r AS HUGEINT) * lrn6) AS hs6 FROM ts_out)
           |SELECT n AS n_docs,
           |       CAST(mi6 AS BIGINT) AS mi6,
           |       CAST(hl6 AS BIGINT) AS h_lang6,
           |       CAST(hs6 AS BIGINT) AS h_source6,
           |       CASE WHEN hl6 = 0 THEN NULL
           |            ELSE CAST(mi6 AS DOUBLE) / CAST(hl6 AS DOUBLE) END AS u_lang_given_source,
           |       CASE WHEN hs6 = 0 THEN NULL
           |            ELSE CAST(mi6 AS DOUBLE) / CAST(hs6 AS DOUBLE) END AS u_source_given_lang
           |FROM mi CROSS JOIN hl CROSS JOIN hs""".stripMargin)),

    // ---- source × language chi-squared independence test ------------------
    // The datacard hypothesis test behind "are languages spread evenly
    // across sources, or do domains specialize": Pearson's χ² over the
    // source × lang contingency table, with Cramér's V as the
    // scale-free effect size. A large V says the mixture designer cannot
    // treat language balance and source balance as independent dials.
    //
    // Float discipline: the full grid (observed AND structurally-zero
    // cells — χ² sums expected mass over every cell) is generated from
    // the marginals; each cell's term is (n·O − r·c)²/(n·r·c) with the
    // numerator an exact DECIMAL(38,0)/HUGEINT square, so per cell there
    // are exactly two correctly-rounded casts + one division, then the
    // 6 dp grid makes the ≤ S×L-term sum order-independent. χ², dof, and
    // V are fixed identical chains on both engines.
    //
    // Scale shape: ONE (source, lang) hash agg over the corpus (map-side
    // combine to ≤ S×L rows); marginals derive from that agg; the grid
    // cross join is S×L ≤ 100 rows. Constant-size everything after the
    // first agg.
    "source_lang_chi2" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val o = Tables.load(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val r = o.groupBy("source").agg(sum(col("o")).as("r"))
        val c0 = o.groupBy("lang").agg(sum(col("o")).as("c"))
        val n = o.agg(sum(col("o")).as("n"), count(lit(1)).as("n_cells"))
        val grid = r.crossJoin(c0)
          .join(o, Seq("source", "lang"), "left")
          .crossJoin(broadcast(n))
          .withColumn("obs", coalesce(col("o"), lit(0L)))
          .withColumn("dev", big(col("n")) * big(col("obs")) - big(col("r")) * big(col("c")))
        val terms = grid.select(
          Q.grid6((col("dev") * col("dev")).cast("double")
            / (big(col("n")) * big(col("r")) * big(col("c"))).cast("double"))
            .cast("decimal(12,6)").as("t6"))
        val dims = r.agg(count(lit(1)).as("ns")).crossJoin(c0.agg(count(lit(1)).as("nl")))
        terms.agg(sum(col("t6")).as("s6"))
          .crossJoin(broadcast(dims))
          .crossJoin(broadcast(n.select(col("n"))))
          .select(col("n").as("n_docs"), col("ns").as("n_sources"), col("nl").as("n_langs"),
            ((col("ns") - 1) * (col("nl") - 1)).as("dof"),
            col("s6").cast("double").as("chi2"),
            sqrt(col("s6").cast("double")
              / (col("n") * least(col("ns") - 1, col("nl") - 1)).cast("double"))
              .as("cramers_v"))
      },
      oracle = Some(
        """WITH o AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
          |           FROM documents GROUP BY source, lang),
          |r AS (SELECT source, CAST(SUM(o) AS HUGEINT) AS r FROM o GROUP BY source),
          |c AS (SELECT lang, CAST(SUM(o) AS HUGEINT) AS c FROM o GROUP BY lang),
          |n AS (SELECT CAST(SUM(o) AS HUGEINT) AS n FROM o),
          |grid AS (
          |  SELECT r.source, c.lang, r.r, c.c, n.n,
          |         CAST(COALESCE(o.o, 0) AS HUGEINT) AS obs
          |  FROM r CROSS JOIN c
          |       LEFT JOIN o ON o.source = r.source AND o.lang = c.lang
          |       CROSS JOIN n),
          |terms AS (
          |  SELECT CAST(floor(
          |           CAST((n * obs - r * c) * (n * obs - r * c) AS DOUBLE)
          |             / CAST(n * r * c AS DOUBLE) * 1000000.0) / 1000000.0
          |           AS DECIMAL(12,6)) AS t6
          |  FROM grid),
          |dims AS (SELECT (SELECT COUNT(*) FROM r) AS ns, (SELECT COUNT(*) FROM c) AS nl)
          |SELECT CAST(n AS BIGINT) AS n_docs,
          |       CAST(ns AS BIGINT) AS n_sources, CAST(nl AS BIGINT) AS n_langs,
          |       CAST((ns - 1) * (nl - 1) AS BIGINT) AS dof,
          |       CAST(s6 AS DOUBLE) AS chi2,
          |       sqrt(CAST(s6 AS DOUBLE)
          |            / CAST(n * least(ns - 1, nl - 1) AS DOUBLE)) AS cramers_v
          |FROM (SELECT CAST(SUM(t6) AS DECIMAL(38,6)) AS s6 FROM terms) t
          |     CROSS JOIN dims CROSS JOIN n""".stripMargin)),

    // ---- source × lang mutual information (added r7) ---------------------
    // The information-theoretic companion to source_lang_chi2's test
    // statistic: I(source; lang) in nats — HOW MANY bits of a doc's
    // language its domain carries (0 = independent, ln(min(S,L)) = fully
    // determined). Only observed cells contribute (0·ln0 = 0), so the
    // marginal joins are keyed, no structural-zero grid needed.
    // ENGINE-VERSION-PROOF (r8): the term decomposes into count-sized
    // ratios — ln(o·n/(r·c)) = ln(o/r) + ln(n/c) — each a [[LnGrid]]
    // fixed-point integer value that adds EXACTLY; × exact obs, int sum,
    // the final /n·10^6 is one bare division. (The decomposition also
    // removes the o·n cross-product entirely — no widening needed at any
    // corpus size.)
    //
    // Scale shape: everything after the one (source, lang) corpus agg runs
    // over ≤ S·L rows; the 1-row total broadcast is R1-whitelisted.
    "source_lang_mi" -> Q(
      fn = (s, dir) => {
        val o = Tables.load(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val r = o.groupBy("source").agg(sum(col("o")).as("r"))
        val c0 = o.groupBy("lang").agg(sum(col("o")).as("c"))
        val n = o.agg(sum(col("o")).as("n"))
        val j0 = o.join(r, Seq("source")).join(c0, Seq("lang")).crossJoin(broadcast(n))
        val j1 = LnGrid.withLn6(j0, col("o"), col("r"), "lor6", "__mo_")
        val j2 = LnGrid.withLn6(j1, col("n"), col("c"), "lnc6", "__mn_")
        j2.select(col("o"), (col("lor6") + col("lnc6")).as("t6"))
          .agg(sum(col("o") * col("t6")).as("s6"), sum(col("o")).as("n"))
          .select(col("n").as("n_docs"),
            (col("s6").cast("double")
              / (col("n") * lit(1000000L)).cast("double")).as("mi_nats"))
      },
      oracle = Some(
        s"""WITH o AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
           |           FROM documents GROUP BY source, lang),
           |r AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY source),
           |c AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY lang),
           |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
           |j AS (SELECT o.o, r.r, c.c, n.n
           |      FROM o JOIN r USING (source) JOIN c USING (lang) CROSS JOIN n),
           |${LnGrid.sqlCtes("j", "o", "r", "lor6", "mo_")},
           |${LnGrid.sqlCtes("mo_out", "n", "c", "lnc6", "mn_")},
           |terms AS (SELECT o, lor6 + lnc6 AS t6 FROM mn_out)
           |SELECT CAST(SUM(o) AS BIGINT) AS n_docs,
           |       CAST(SUM(o * t6) AS DOUBLE)
           |         / CAST(SUM(o) * 1000000 AS DOUBLE) AS mi_nats
           |FROM terms""".stripMargin)),

    // ---- deterministic stratified train/val/test split --------------------
    // Assignment by the first two hex chars of md5("split:" ∥ doc_id):
    // 00–cb → train (204/256 ≈ 79.7%), cc–e5 → val (26/256 ≈ 10.2%),
    // e6–ff → test (26/256 ≈ 10.2%). Pure string comparison on the
    // lowercase hex — no hex→int parsing to disagree on — and the doc's
    // assignment never changes as the corpus grows (the property that
    // makes hash splits the standard over random ones). Audited per
    // source: counts, token mass, and the realized fraction.
    //
    // Scale shape: a stateless map-side predicate + one (source, split)
    // agg; the per-source totals join is ≤ #sources rows, broadcast.
    "train_split" -> Q(
      fn = (s, dir) => {
        val assigned = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
          .withColumn("split",
            when(col("h2") < "cc", "train")
              .when(col("h2") < "e6", "val").otherwise("test"))
        val bySplit = assigned.groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        val totals = assigned.groupBy("source").agg(count(lit(1)).as("tot"))
        bySplit.join(broadcast(totals), Seq("source"))
          .select(col("source"), col("split"), col("n_docs"), col("n_chars"),
            (col("n_docs").cast("double") / col("tot")).as("frac"))
          .orderBy("source", "split")
      },
      oracle = Some(
        """WITH a AS (
          |  SELECT source, n_chars,
          |         CASE WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'cc' THEN 'train'
          |              WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'e6' THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM documents),
          |b AS (SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
          |      FROM a GROUP BY source, split),
          |t AS (SELECT source, COUNT(*) AS tot FROM a GROUP BY source)
          |SELECT b.source, b.split, b.n_docs, b.n_chars,
          |       CAST(b.n_docs AS DOUBLE) / t.tot AS frac
          |FROM b JOIN t ON b.source = t.source
          |ORDER BY b.source, b.split""".stripMargin)),

    // ---- cross-source overlap matrix --------------------------------------
    // The datacard-level contamination diagnostic published alongside every
    // major open corpus (e.g. the C4/Pile/RealNews overlap tables in Dodge
    // et al. 2021 "Documenting Large Webtext Corpora"): for every PAIR of
    // sources, how much verbatim 5-gram material they share, as a Jaccard
    // over each source's distinct shingle set. contamination_score answers
    // "is THIS doc tainted by the benchmark"; this answers "which SOURCES
    // duplicate each other", the input to mix design (double-counting a
    // source pair that is 40% shared inflates its effective weight).
    //
    // Scale shape: one corpus pass → per-shingle SORTED SOURCE SET
    // (collect_set under the gh-keyed agg — map-side partial sets dedup
    // before the only shuffle, which is vocab-keyed, not corpus-keyed).
    // The set is bounded by n_sources (≤20 — a curated list, not data),
    // so both downstream views are cheap array explodes of that one agg:
    // ordered pairs (≤ S(S−1)/2 = 190 structs per shingle) for the
    // intersection counts, elements for the per-source set sizes. There
    // is NO self-join at all — the shape a naive "distinct ⋈ distinct on
    // gh" plan would re-scan the corpus 6× for (measured via ReuseCheck)
    // collapses into one aggregation read twice. Final assembly joins are
    // S-row broadcasts.
    //
    // Float parity: counts are exact ints; jaccard is ONE bare division
    // of exact ints (n_a + n_b − n_shared is int arithmetic).
    "source_overlap" -> Q(
      fn = (s, dir) => {
        val byGh = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("source"), explode(graft.functions.WindowMd5Functions
            .rollingWindowHashes(col("toks"), 5)).as("gh"))
          .groupBy("gh")
          .agg(sort_array(collect_set(col("source"))).as("srcs"))
        val sizes = byGh.select(explode(col("srcs")).as("source"))
          .groupBy("source").agg(count(lit(1)).as("n"))
        byGh.filter(size(col("srcs")) >= 2)
          .select(explode(expr(
            """flatten(transform(srcs, (x, i) ->
              |  transform(slice(srcs, i + 2, size(srcs)),
              |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
          .groupBy(col("p.a").as("a_src"), col("p.b").as("b_src"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(sizes.select(col("source").as("a_src"), col("n").as("n_a"))), Seq("a_src"))
          .join(broadcast(sizes.select(col("source").as("b_src"), col("n").as("n_b"))), Seq("b_src"))
          .select(col("a_src"), col("b_src"), col("n_a"), col("n_b"), col("n_shared"),
            (col("n_shared").cast("double")
              / (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
          .orderBy("a_src", "b_src")
      },
      oracle = Some(
        """WITH d AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
          |sh AS (SELECT DISTINCT source, gh FROM (
          |        SELECT source, UNNEST(list_transform(range(len(toks) - 4),
          |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
          |        FROM d WHERE len(toks) >= 5)),
          |sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
          |ov AS (SELECT x.source AS a_src, y.source AS b_src, COUNT(*) AS n_shared
          |       FROM sh x JOIN sh y ON x.gh = y.gh AND x.source < y.source
          |       GROUP BY 1, 2)
          |SELECT a_src, b_src, sa.n AS n_a, sb.n AS n_b, n_shared,
          |       CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
          |FROM ov JOIN sz sa ON sa.source = a_src JOIN sz sb ON sb.source = b_src
          |ORDER BY a_src, b_src""".stripMargin)),

    // ---- token-budget / epoch-allocation plan -----------------------------
    // The data-recipe arithmetic from data-constrained scaling (Muennighoff
    // et al. 2023, "Scaling Data-Constrained Language Models"): given a
    // training budget T tokens and the temperature-flattened mixture
    // weights w_s (the EXACT mix_weights construction, α = 0.5), each
    // source is allocated T·w_s tokens and therefore repeats for
    // epochs_s = T·w_s / n_s. Flattening over-weights small sources, so
    // their epochs exceed the ~4-epoch useful-repetition ceiling the paper
    // measures — the over_cap flag is the signal to re-temper or cap.
    // T = 2× the corpus (one-epoch-plus, the data-constrained regime; a
    // caller parameterizes it).
    //
    // Scale shape: identical to mix_weights — one corpus pass for the
    // per-source token agg, 1-row totals broadcast twice; the corpus is
    // never shuffled. ENGINE-VERSION-PROOF (r8 doctrine, Queries.scala):
    // the weight comes from mix_weights' rebuilt integer grid —
    // share10 = (n_s·10^10) div T, w5 = Q.isqrt(share10), Σw5 exact —
    // so no libm result or round(double, n) reaches a hashed byte;
    // weight/alloc/epochs are then fixed chains of bare IEEE ops (+ × ÷)
    // on identical exact inputs, bit-identical on both engines; over_cap
    // is a comparison on that deterministic double, emitted as an exact
    // 0/1 BIGINT.
    "token_budget_plan" -> Q(
      fn = (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
        val tot = tok.agg(sum(col("n_tokens")).as("t_total"))
        val withW = tok.crossJoin(broadcast(tot))
          .withColumn("share10", expr("(n_tokens * 10000000000) div t_total"))
          .withColumn("w5", Q.isqrt(col("share10")))
        val wsum = withW.agg(sum(col("w5")).as("wsum"))
        withW.crossJoin(broadcast(wsum))
          .withColumn("weight", col("w5").cast("double") / col("wsum").cast("double"))
          .withColumn("alloc_tokens",
            (lit(2.0d) * col("t_total").cast("double")) * col("weight"))
          .withColumn("epochs", col("alloc_tokens") / col("n_tokens").cast("double"))
          .select(col("source"), col("n_tokens"), col("weight"),
            col("alloc_tokens"), col("epochs"),
            when(col("epochs") > lit(4.0d), 1L).otherwise(0L).as("over_cap"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH tok AS (SELECT source,
          |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          |            FROM documents GROUP BY source),
          |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total FROM tok),
          |g AS (SELECT source, n_tokens, t_total,
          |             (n_tokens * 10000000000) // t_total AS share10
          |      FROM tok, tot),
          |s0 AS (SELECT g.*, CAST(floor(sqrt(CAST(share10 AS DOUBLE))) AS BIGINT) AS c0 FROM g),
          |w AS (SELECT source, n_tokens, t_total, share10,
          |             CASE WHEN (c0 + 1) * (c0 + 1) <= share10 THEN c0 + 1
          |                  WHEN c0 * c0 > share10 THEN c0 - 1 ELSE c0 END AS w5
          |      FROM s0),
          |ws AS (SELECT CAST(SUM(w5) AS BIGINT) AS wsum FROM w),
          |p AS (SELECT source, n_tokens,
          |             CAST(w5 AS DOUBLE) / CAST(wsum AS DOUBLE) AS weight,
          |             (2.0 * CAST(t_total AS DOUBLE))
          |               * (CAST(w5 AS DOUBLE) / CAST(wsum AS DOUBLE)) AS alloc_tokens
          |      FROM w, ws)
          |SELECT source, n_tokens, weight, alloc_tokens,
          |       alloc_tokens / CAST(n_tokens AS DOUBLE) AS epochs,
          |       CAST(CASE WHEN alloc_tokens / CAST(n_tokens AS DOUBLE) > 4.0
          |                 THEN 1 ELSE 0 END AS BIGINT) AS over_cap
          |FROM p ORDER BY source""".stripMargin)),

    // ---- Gopher quality rule gates (Rae et al. 2021 §A.1.1) --------------
    // Boolean per-document filters, emitted individually (for rule-level
    // datacard accounting) plus the conjunction. The thresholds are the
    // paper's where the corpus exercises them (mean word length ∈ [3, 10],
    // ≥80% alpha words, ≤10% symbol ratio, ≥2 canonical stopwords) and
    // corpus-calibrated for the word-count band.
    //
    // Float parity: NONE NEEDED. Every ratio threshold is cross-multiplied
    // into exact integer comparisons (5·n_alpha ≥ 4·n_words instead of
    // n_alpha/n_words ≥ 0.8), so the whole operator is int64 arithmetic —
    // the strongest possible cross-engine contract.
    //
    // Scale shape: a single stateless projection over the corpus — no
    // shuffle, no join, no agg; predicate-pushdown and column-pruning
    // friendly (only `text` is read beyond the key). At 100 TB this is the
    // map phase of the ingest pass.
    "gopher_rules" -> Q(
      fn = (s, dir) => {
        val m = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_words", size(col("toks")).cast("long"))
          // words are single-space separated: chars-in-words = len - (n-1)
          .withColumn("n_wchars",
            (length(col("text")) - (col("n_words") - 1)).cast("long"))
          .withColumn("n_alpha",
            expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("long"))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN ($GopherStopSql)))").cast("long"))
          .withColumn("n_sym",
            (length(col("text"))
              - length(translate(col("text"), "#…", ""))).cast("long"))
        m.select(
            col("doc_id"), col("n_words"),
            (col("n_words") >= 20L && col("n_words") <= 90L).as("r_count"),
            (col("n_wchars") >= lit(3L) * col("n_words")
              && col("n_wchars") <= lit(10L) * col("n_words")).as("r_meanlen"),
            (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")).as("r_alpha"),
            (lit(10L) * col("n_sym") <= col("n_words")).as("r_symbol"),
            (col("n_stop") >= 2L).as("r_stop"))
          .withColumn("pass",
            col("r_count") && col("r_meanlen") && col("r_alpha")
              && col("r_symbol") && col("r_stop"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
           |                  length(text) AS nc FROM documents),
           |m AS (SELECT doc_id,
           |             CAST(len(toks) AS BIGINT) AS n_words,
           |             CAST(nc - (len(toks) - 1) AS BIGINT) AS n_wchars,
           |             CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
           |             CAST(len(list_filter(toks, w -> w IN ($GopherStopSql))) AS BIGINT) AS n_stop,
           |             CAST(nc - length(replace(replace(text, '#', ''), '…', '')) AS BIGINT) AS n_sym
           |      FROM t)
           |SELECT doc_id, n_words,
           |       n_words >= 20 AND n_words <= 90 AS r_count,
           |       n_wchars >= 3 * n_words AND n_wchars <= 10 * n_words AS r_meanlen,
           |       5 * n_alpha >= 4 * n_words AS r_alpha,
           |       10 * n_sym <= n_words AS r_symbol,
           |       n_stop >= 2 AS r_stop,
           |       (n_words >= 20 AND n_words <= 90)
           |         AND (n_wchars >= 3 * n_words AND n_wchars <= 10 * n_words)
           |         AND (5 * n_alpha >= 4 * n_words)
           |         AND (10 * n_sym <= n_words)
           |         AND (n_stop >= 2) AS pass
           |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- Herfindahl concentration of the source mix (added r8) -----------
    // The antitrust-standard concentration index applied to the training
    // mix: HHI = Σ share_s² over source token shares, and its reciprocal
    // — the EFFECTIVE number of sources (20 listed sources acting like
    // 3.2 effective ones means the mix is an oligopoly and de-dup or
    // re-weighting one giant source changes everything). The mix-design
    // summary gini_source_tokens (rank view) and theil_decomposition
    // (log view) bracket; HHI is the moment regulators and mixture papers
    // quote. EXACT: HHI = ΣS_s²/S², eff = S²/ΣS_s² — each ONE bare
    // division of exact int64 sums (ΣS_s² ≤ 2e14 at gate scale; DECIMAL
    // at 100 TB per the token_burstiness discipline).
    //
    // Scale shape: one per-source token agg → a 1-row roll-up.
    "source_hhi" -> Q(
      fn = (s, dir) => {
        val src = Tables.load(s, dir, "documents")
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("ss"))
        src.agg(count(lit(1)).as("n_sources"), sum(col("ss")).as("st"),
            sum(col("ss") * col("ss")).as("s2"))
          .select(col("n_sources"), col("st").as("total_tokens"),
            when(col("st") === 0, lit(null).cast("double"))
              .otherwise(col("s2").cast("double")
                / (col("st") * col("st")).cast("double")).as("hhi"),
            when(col("s2") === 0, lit(null).cast("double"))
              .otherwise((col("st") * col("st")).cast("double")
                / col("s2").cast("double")).as("effective_sources"))
      },
      oracle = Some(
        """WITH src AS (SELECT source,
          |               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ss
          |             FROM documents GROUP BY source),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
          |             CAST(SUM(ss) AS BIGINT) AS st,
          |             CAST(SUM(ss * ss) AS BIGINT) AS s2
          |      FROM src)
          |SELECT n_sources, st AS total_tokens,
          |       CASE WHEN st = 0 THEN NULL
          |            ELSE CAST(s2 AS DOUBLE) / CAST(st * st AS DOUBLE) END AS hhi,
          |       CASE WHEN s2 = 0 THEN NULL
          |            ELSE CAST(st * st AS DOUBLE) / CAST(s2 AS DOUBLE) END
          |         AS effective_sources
          |FROM a""".stripMargin)),

    // ---- quality rank parity across sources (added r8) -------------------
    // The mix-fairness audit: does the quality scorer systematically rank
    // one source's documents low? Per source, the mean GLOBAL quality
    // rank normalized to (0, 1) — parity ≈ ½ is a calibrated scorer;
    // parity ≪ ½ means quality-thresholded curation will quietly starve
    // that source (the quality_buckets stratification exists precisely to
    // prevent this; this query MEASURES whether it was needed). EXACT
    // ranks at corpus scale via the stitched-rank discipline
    // (gini_user_revenue's construction, proven by the oracle's plain
    // global ROW_NUMBER hash-matching): shard by the monotone quality
    // band q6 div 10⁵ (≤ 11 shards), rank within shard by (q6, doc_id),
    // add tiny-frame offsets. parity = Σranks/(n_s·N) — ONE bare division
    // per source; Σranks over ALL sources must equal N(N+1)/2 exactly
    // (spec-pinned conservation).
    //
    // Scale shape: map-only quality projection → band-partitioned rank
    // windows + ≤11-row offsets frame → ≤|sources| roll-up with the 1-row
    // N broadcast.
    "quality_rank_parity" -> Q(
      fn = (s, dir) => {
        val q6 = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .select(col("doc_id"), col("source"),
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long").as("q6"))
          .withColumn("g", expr("q6 div 100000"))
        val rn = q6.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("q6"), col("doc_id"))))
        val offsets = q6.groupBy("g").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select(col("g"), col("off"))
        val nTot = q6.agg(count(lit(1)).as("nn"))
        rn.join(broadcast(offsets), Seq("g"))
          .withColumn("r", col("off") + col("rn"))
          .groupBy("source").agg(count(lit(1)).as("n_docs"), sum(col("r")).as("sum_rank"))
          .crossJoin(broadcast(nTot))
          .select(col("source"), col("n_docs"), col("sum_rank"),
            (col("sum_rank").cast("double")
              / (col("n_docs") * col("nn")).cast("double")).as("parity"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks,
           |                  length(text) AS nc FROM documents),
           |q AS (SELECT doc_id, source,
           |             CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                  + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                        w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                        AS DOUBLE) / len(toks))
           |                  + 0.3 * least(1.0, CAST(nc AS DOUBLE) / 200.0))
           |                  * 1000000.0) AS BIGINT) AS q6
           |      FROM t),
           |r AS (SELECT source, ROW_NUMBER() OVER (ORDER BY q6, doc_id) AS r FROM q),
           |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM q),
           |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |             CAST(SUM(r) AS BIGINT) AS sum_rank
           |      FROM r GROUP BY source)
           |SELECT source, n_docs, sum_rank,
           |       CAST(sum_rank AS DOUBLE) / CAST(n_docs * nt.nn AS DOUBLE) AS parity
           |FROM a, nt ORDER BY source""".stripMargin)),

    // ---- deterministic source-interleave schedule (added r8) -------------
    // The dataloader's missing piece between mix_weights (HOW MUCH of each
    // source) and shuffle_deterministic (WITHIN-source order): WHICH
    // source each global step reads — the tf.data-interleave /
    // weighted-round-robin schedule, in CLOSED FORM so any worker can
    // compute its slice without coordination: source s's k-th emission
    // sits at virtual position p = ⌈(2k−1)·W/(2w_s)⌉ (the evenly-spaced
    // largest-remainder rule — emissions of each source are W/w_s apart,
    // phase-centered), and the global schedule is all (p, source, k)
    // sorted by (p, source). Integer ceil via (x + d − 1) div d — exact
    // on both engines; the first 100 steps are emitted with their
    // cumulative per-source counts (k), which a spec checks against the
    // weight proportions (WRR drift ≤ 1 emission per source at every
    // prefix — the Bresenham property).
    //
    // Scale shape: ≤|sources| weight agg → a sources×100 generated frame
    // (bounded by the SCHEDULE length, not the corpus) → one bounded-frame
    // rank; the corpus pass is the weight agg alone.
    "interleave_schedule" -> Q(
      fn = (s, dir) => {
        val w = Tables.load(s, dir, "documents")
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("w"))
        val tot = w.agg(sum(col("w")).as("tw"))
        val cand = w.crossJoin(broadcast(tot))
          .select(col("source"), col("w"), col("tw"),
            explode(expr("sequence(1, 100)")).as("k"))
          .withColumn("p",
            expr("((2 * k - 1) * tw + 2 * w - 1) div (2 * w)"))
        val wr = Window.orderBy(col("p"), col("source"))
        cand.withColumn("step", row_number().over(wr))
          .filter(col("step") <= 100)
          .select(col("step"), col("source"), col("k"), col("p"))
          .orderBy("step")
      },
      oracle = Some(
        """WITH w AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS w
          |           FROM documents GROUP BY source),
          |tt AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
          |cand AS (SELECT source, w.w, tt.tw, CAST(k AS INTEGER) AS k,
          |                ((2 * k - 1) * tt.tw + 2 * w.w - 1) // (2 * w.w) AS p
          |         FROM w, tt, UNNEST(range(1, 101)) AS u(k)),
          |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p, source) AS step FROM cand)
          |SELECT CAST(step AS INTEGER) AS step, source, k, p
          |FROM r WHERE step <= 100 ORDER BY step""".stripMargin)),

    // ---- temporal split audit: entity leakage across time (added r8) -----
    // The TIME-based complement of train_split (hash) + split_leakage
    // (near-dup): when eval data is "everything after day T" — the honest
    // setup for forecasting/recommendation evals — the remaining leak
    // vector is ENTITIES spanning the boundary: a user seen in train whose
    // test-side behavior the model effectively memorized. Split at the
    // 2/3 point of the calendar span (integer day arithmetic, identical
    // on both engines); per user: train-only / test-only / spanning, plus
    // event mass on each side and the spanning-user share of test events
    // (the leakage exposure number). All exact counts, shares ONE bare
    // division each.
    //
    // Scale shape: one (user, side) agg → per-user classification →
    // 1-row roll-up; the split day is a 1-row min/max broadcast.
    "temporal_split_audit" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val bounds = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
          .select(expr("date_add(d0, cast((datediff(d1, d0) * 2) div 3 as int))")
            .as("cut"))
        val sided = ev.crossJoin(broadcast(bounds))
          .select(col("user_id"), (col("d") <= col("cut")).cast("long").as("tr"))
        val perUser = sided.groupBy("user_id")
          .agg(sum(col("tr")).as("n_tr"), sum(lit(1L) - col("tr")).as("n_te"))
        perUser.agg(
            count(lit(1)).as("n_users"),
            sum(when(col("n_tr") > 0 && col("n_te") === 0, 1L).otherwise(0L)).as("train_only"),
            sum(when(col("n_tr") === 0 && col("n_te") > 0, 1L).otherwise(0L)).as("test_only"),
            sum(when(col("n_tr") > 0 && col("n_te") > 0, 1L).otherwise(0L)).as("spanning"),
            sum(col("n_tr")).as("train_events"),
            sum(col("n_te")).as("test_events"),
            sum(when(col("n_tr") > 0, col("n_te")).otherwise(0L)).as("leaked_test_events"))
          .select(col("n_users"), col("train_only"), col("test_only"), col("spanning"),
            col("train_events"), col("test_events"),
            when(col("test_events") === 0, lit(null).cast("double"))
              .otherwise(col("leaked_test_events").cast("double")
                / col("test_events").cast("double")).as("leak_share"))
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          |b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ev),
          |c AS (SELECT d0 + CAST((datediff('day', d0, d1) * 2) // 3 AS INTEGER) AS cut
          |      FROM b),
          |sided AS (SELECT user_id,
          |                 CASE WHEN d <= (SELECT cut FROM c) THEN 1 ELSE 0 END AS tr
          |          FROM ev),
          |pu AS (SELECT user_id, CAST(SUM(tr) AS BIGINT) AS n_tr,
          |              CAST(SUM(1 - tr) AS BIGINT) AS n_te
          |       FROM sided GROUP BY user_id),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
          |             CAST(SUM(CASE WHEN n_tr > 0 AND n_te = 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_only,
          |             CAST(SUM(CASE WHEN n_tr = 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS test_only,
          |             CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS spanning,
          |             CAST(SUM(n_tr) AS BIGINT) AS train_events,
          |             CAST(SUM(n_te) AS BIGINT) AS test_events,
          |             CAST(SUM(CASE WHEN n_tr > 0 THEN n_te ELSE 0 END) AS BIGINT) AS leaked_test_events
          |      FROM pu)
          |SELECT n_users, train_only, test_only, spanning, train_events, test_events,
          |       CASE WHEN test_events = 0 THEN NULL
          |            ELSE CAST(leaked_test_events AS DOUBLE)
          |                 / CAST(test_events AS DOUBLE) END AS leak_share
          |FROM a""".stripMargin)),

    // ---- Naive-Bayes source separability (added r8) ----------------------
    // "How lexically identifiable is each source?" — train an add-1
    // multinomial NB source classifier on the corpus itself and report
    // per-source self-classification accuracy (the confusion diagonal).
    // High accuracy = the source is a distinct lexical domain (mixture
    // weights matter, DoReMi-style); accuracy near the prior = the source
    // is interchangeable with the pool and deduplicating across it is
    // safe. The token-level twin of lang_confusion's char-heuristic
    // confusion and the per-DOC sharpening of source_centroid_sim.
    // ENGINE-VERSION-PROOF: per-(doc, source) scores are exact int64 sums
    // of LnGrid values — Σ_t c_dt·ln6(c_st+1, n_s+V) for present tokens
    // plus the missing-mass term (len_d − present_ds)·ln6(1, n_s+V) (the
    // source_jsd inner-join trick — no dense doc×vocab×source explosion)
    // plus the prior ln6(docs_s, N); argmax by min(struct(−score,
    // source)) — integer compare, deterministic tie-break; accuracy ONE
    // bare division.
    //
    // Scale shape: doc-token frame ⋈ (source, tok) model on tok (sparse,
    // vocab-keyed — the heavy join is linear in corpus tokens × sources
    // SHARING the token, never dense) → (doc, source) agg → per-doc
    // argmax agg → ≤|sources| roll-up; model-side frames broadcast.
    "source_separability" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // r16: dt feeds dlen, st (→ srcTot/vocabV/model) AND the present
        // join — the lazy form re-derived the corpus tokenize+explode per
        // branch and the consts/model composition multiplied the subtrees
        // (ReuseCheck: 19 parquet scans, 3 reused exchanges). Materialize
        // the (doc, tok) counts ONCE; every model/grid frame then reads the
        // checkpoint — one corpus tokenize pass at any scale (the r15 "st
        // derives from dt" fix, completed).
        val dt = Q.truncate(docs
          .select(col("doc_id"), col("source").as("true_src"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "true_src", "tok").agg(count(lit(1)).as("cdt")))
        val dlen = dt.groupBy("doc_id", "true_src").agg(sum(col("cdt")).as("len"))
        // r15 (guide §2.3 "aggregate before you shuffle"): the per-source
        // token counts are EXACTLY the doc-token counts re-aggregated —
        // st = Σ_docs cdt — so derive them from dt instead of a second
        // tokenize+explode pass over the corpus (one scan + one exploded
        // shuffle removed; the oracle spells st independently but computes
        // the identical counts)
        val st = dt
          .groupBy(col("true_src").as("source"), col("tok"))
          .agg(sum(col("cdt")).as("cst"))
        val srcTot = st.groupBy("source").agg(sum(col("cst")).as("ns"))
        val vocabV = st.agg(countDistinct(col("tok")).as("v"))
        val nDocs = docs.groupBy("source").agg(count(lit(1)).as("docs_s"))
        val nTot = docs.agg(count(lit(1)).as("n"))
        val consts0 = srcTot.join(nDocs, Seq("source"))
          .crossJoin(broadcast(vocabV)).crossJoin(broadcast(nTot))
        val consts1 = LnGrid.withLn6(consts0, lit(1L), col("ns") + col("v"),
          "miss6", "__m_")
        val consts = LnGrid.withLn6(consts1, col("docs_s"), col("n"), "prior6", "__p_")
          .select(col("source"), col("ns"), col("v"), col("miss6"), col("prior6"))
        val model0 = st.join(broadcast(consts.select("source", "ns", "v")), Seq("source"))
        val model = LnGrid.withLn6(model0, col("cst") + 1, col("ns") + col("v"),
            "l6", "__nb_")
          .select(col("source"), col("tok"), col("l6"))
        val present = dt.join(model, Seq("tok"))
          .groupBy(col("doc_id"), col("true_src"), col("source"))
          .agg(sum(col("cdt") * col("l6")).as("psum"), sum(col("cdt")).as("pcnt"))
        val grid = dlen.crossJoin(broadcast(consts.select("source", "miss6", "prior6")))
          .join(present, Seq("doc_id", "true_src", "source"), "left")
          .na.fill(0L, Seq("psum", "pcnt"))
          .withColumn("score",
            col("psum") + (col("len") - col("pcnt")) * col("miss6") + col("prior6"))
        val pred = grid
          .groupBy("doc_id", "true_src")
          .agg(min(struct(negate(col("score")).as("nsc"), col("source").as("source"))).as("m"))
          .select(col("true_src"), col("m.source").as("pred_src"))
        pred.groupBy(col("true_src").as("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("pred_src") === col("true_src"), 1L).otherwise(0L))
              .as("n_correct"))
          .select(col("source"), col("n_docs"), col("n_correct"),
            (col("n_correct").cast("double") / col("n_docs").cast("double"))
              .as("accuracy"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH dt AS (SELECT doc_id, true_src, tok, CAST(COUNT(*) AS BIGINT) AS cdt
           |            FROM (SELECT doc_id, source AS true_src,
           |                         unnest(string_split(text, ' ')) AS tok FROM documents)
           |            GROUP BY doc_id, true_src, tok),
           |dlen AS (SELECT doc_id, true_src, CAST(SUM(cdt) AS BIGINT) AS len
           |         FROM dt GROUP BY doc_id, true_src),
           |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cst
           |       FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
           |             FROM documents)
           |       GROUP BY source, tok),
           |stt AS (SELECT source, CAST(SUM(cst) AS BIGINT) AS ns FROM st GROUP BY source),
           |vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM st),
           |ndoc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_s
           |         FROM documents GROUP BY source),
           |ntt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
           |c0 AS (SELECT stt.source, stt.ns, ndoc.docs_s, vv.v, ntt.n
           |       FROM stt JOIN ndoc USING (source), vv, ntt),
           |${LnGrid.sqlCtes("c0", "1", "ns + v", "miss6", "cm_")},
           |${LnGrid.sqlCtes("cm_out", "docs_s", "n", "prior6", "cp_")},
           |consts AS (SELECT source, ns, v, miss6, prior6 FROM cp_out),
           |m0 AS (SELECT st.source, st.tok, st.cst, c.ns, c.v
           |       FROM st JOIN consts c USING (source)),
           |${LnGrid.sqlCtes("m0", "cst + 1", "ns + v", "l6", "nb_")},
           |model AS (SELECT source, tok, l6 FROM nb_out),
           |pres AS (SELECT dt.doc_id, dt.true_src, m.source,
           |                CAST(SUM(dt.cdt * m.l6) AS BIGINT) AS psum,
           |                CAST(SUM(dt.cdt) AS BIGINT) AS pcnt
           |         FROM dt JOIN model m USING (tok)
           |         GROUP BY dt.doc_id, dt.true_src, m.source),
           |grid AS (SELECT d.doc_id, d.true_src, c.source,
           |                COALESCE(p.psum, 0)
           |                  + (d.len - COALESCE(p.pcnt, 0)) * c.miss6
           |                  + c.prior6 AS score
           |         FROM dlen d CROSS JOIN consts c
           |         LEFT JOIN pres p ON p.doc_id = d.doc_id AND p.source = c.source),
           |pred AS (SELECT doc_id, true_src, source AS pred_src,
           |                ROW_NUMBER() OVER (PARTITION BY doc_id
           |                  ORDER BY score DESC, source) AS rk
           |         FROM grid),
           |acc AS (SELECT true_src, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |               CAST(SUM(CASE WHEN pred_src = true_src THEN 1 ELSE 0 END)
           |                    AS BIGINT) AS n_correct
           |        FROM pred WHERE rk = 1 GROUP BY true_src)
           |SELECT true_src AS source, n_docs, n_correct,
           |       CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE) AS accuracy
           |FROM acc ORDER BY source""".stripMargin)),

    // ---- greedy submodular source selection by bigram coverage (r8) ------
    // Facility-location-style greedy max-coverage over the mix-design axis
    // the divergence family (source_kl/jsd) can't answer: "which 3 sources
    // TOGETHER cover the most distinct word-pair contexts?" Round k picks
    // the source with the largest corpus-mass-weighted sum of bigram TYPES
    // not yet covered by earlier picks (Nemhauser's greedy — (1−1/e)
    // of optimal for monotone submodular objectives; the lexical twin of
    // kcenter_select's geometric diversity pick). Marginal gains shrink by
    // construction — the emitted cum_share curve is the "how many sources
    // until coverage saturates" read. ENGINE-VERSION-PROOF: gains are
    // exact int64 sums of corpus counts; argmax via min(struct(−gain,
    // source)) ⇔ ORDER BY gain DESC, source LIMIT 1; cum_share ONE bare
    // division.
    //
    // Scale shape: the kcenter loop discipline — per round ONE keyed
    // anti-join against the picked source's (vocab²-bounded) covered set +
    // a ≤|sources| gain agg, localCheckpointed so round k never re-runs
    // rounds 1..k−1; the corpus pass happens once, everything after is
    // incidence-frame-sized (≤ sources × vocab² rows).
    "greedy_source_cover" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
        val bgAll = toks.filter(size(col("toks")) >= 2)
          .select(col("source"), explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"""
              .stripMargin)).as("bg"))
        // r16 (guide §2.3 "aggregate before you shuffle" + §2.4 "share one
        // exchange"): the old spelling ran the corpus bigram explode THREE
        // times — once for the per-bigram weights wt, once for the distinct
        // incidence frame, and once more for `tot` (lazy, re-derived at the
        // final action because only st is checkpointed). The per-(source,
        // bigram) counts subsume all three: their keys ARE the distinct
        // incidence rows, w = Σ_sources c over the bg window (every
        // occurrence of bg belongs to exactly one source), and
        // total = Σ c — read off the CHECKPOINTED st, zero extra passes.
        // One corpus explode + one (source,bg) exchange + one
        // incidence-sized bg window exchange, instead of two corpus-sized
        // aggregations, a corpus-sized distinct, a join, and a third
        // corpus pass for tot.
        val sbg = bgAll.groupBy("source", "bg").agg(count(lit(1)).as("c"))
        var st = sbg
          .withColumn("w", sum(col("c")).over(Window.partitionBy(col("bg"))))
          .localCheckpoint()
        val tot = st.agg(sum(col("c")).as("total"))
        var picks: org.apache.spark.sql.DataFrame = null
        for (k <- 1 to 3) {
          val pick = st.groupBy("source").agg(sum(col("w")).as("gain"))
            .agg(min(struct(negate(col("gain")).as("ng"), col("source").as("source"))).as("m"))
            .select(col("m.source").as("source"), negate(col("m.ng")).as("gain"))
            .filter(col("source").isNotNull)
            .withColumn("round", lit(k.toLong))
          picks = if (picks == null) pick else picks.unionByName(pick)
          if (k < 3) {
            // covered: the picked source's bg values are already distinct
            // within the source (sbg keys) — no dedup shuffle needed
            val covered = st.join(broadcast(pick.select(col("source").as("ps"))),
              col("source") === col("ps")).select("bg")
            st = st.join(broadcast(pick.select(col("source").as("ps"))),
                col("source") === col("ps"), "left_anti")
              .join(covered, Seq("bg"), "left_anti")
              .localCheckpoint()
          }
        }
        val wr = Window.orderBy(col("round"))
        picks.crossJoin(broadcast(tot))
          .withColumn("cum_gain", sum(col("gain")).over(wr))
          .select(col("round"), col("source"), col("gain"), col("cum_gain"),
            (col("cum_gain").cast("double") / col("total").cast("double")).as("cum_share"))
          .orderBy("round")
      },
      oracle = Some(
        """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
          |bga AS (SELECT source, toks[i] || ' ' || toks[i + 1] AS bg
          |        FROM t, UNNEST(range(1, len(toks))) AS u(i)
          |        WHERE len(toks) >= 2),
          |wt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS w FROM bga GROUP BY bg),
          |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM wt),
          |st1 AS (SELECT b.source, b.bg, w.w
          |        FROM (SELECT DISTINCT source, bg FROM bga) b JOIN wt w USING (bg)),
          |p1 AS (SELECT source, CAST(SUM(w) AS BIGINT) AS gain FROM st1
          |       GROUP BY source ORDER BY gain DESC, source LIMIT 1),
          |st2 AS (SELECT s.* FROM st1 s
          |        WHERE s.source <> (SELECT source FROM p1)
          |          AND s.bg NOT IN (SELECT bg FROM st1
          |                           WHERE source = (SELECT source FROM p1))),
          |p2 AS (SELECT source, CAST(SUM(w) AS BIGINT) AS gain FROM st2
          |       GROUP BY source ORDER BY gain DESC, source LIMIT 1),
          |st3 AS (SELECT s.* FROM st2 s
          |        WHERE s.source <> (SELECT source FROM p2)
          |          AND s.bg NOT IN (SELECT bg FROM st2
          |                           WHERE source = (SELECT source FROM p2))),
          |p3 AS (SELECT source, CAST(SUM(w) AS BIGINT) AS gain FROM st3
          |       GROUP BY source ORDER BY gain DESC, source LIMIT 1),
          |picks AS (SELECT CAST(1 AS BIGINT) AS round, source, gain FROM p1
          |          UNION ALL SELECT CAST(2 AS BIGINT), source, gain FROM p2
          |          UNION ALL SELECT CAST(3 AS BIGINT), source, gain FROM p3)
          |SELECT round, source, gain,
          |       CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS cum_gain,
          |       CAST(CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS DOUBLE)
          |         / CAST((SELECT total FROM tot) AS DOUBLE) AS cum_share
          |FROM picks ORDER BY round""".stripMargin)),

    // ---- inter-rater agreement of two independent quality raters (r8) ----
    // Cohen's kappa between the two quality filters the registry already
    // trusts separately: rater A = gopher_rules' all-five-rules pass
    // (verbatim rule expressions, same stop list), rater B = quality_score
    // ≥ 0.5 (verbatim formula, same 10⁻⁶ floor grid, compared as the exact
    // integer q6 ≥ 500000). Raw agreement overstates consensus when both
    // raters mostly say "pass"; kappa subtracts the chance-agreement floor
    // — the standard before-you-trust-either-filter audit, and the exact
    // pattern for scoring heuristic labelers against each other in a
    // labeling pipeline. ENGINE-VERSION-PROOF: the 2×2 table is exact
    // counts; with marginals a1/a0, b1/b0,
    //   κ = (n·agree − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))
    // — int64 cross-products (n ≤ 6e4 → products ≤ 3.6e9), po and κ each
    // ONE bare division. Scale shape: one map-only label projection → a
    // 1-row aggregate; nothing else.
    "rater_agreement" -> Q(
      fn = (s, dir) => {
        val m = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_words", size(col("toks")).cast("long"))
          .withColumn("n_wchars",
            (length(col("text")) - (col("n_words") - 1)).cast("long"))
          .withColumn("n_alpha",
            expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("long"))
          .withColumn("n_gstop",
            expr(s"size(filter(toks, t -> t IN ($GopherStopSql)))").cast("long"))
          .withColumn("n_sym",
            (length(col("text"))
              - length(translate(col("text"), "#…", ""))).cast("long"))
          .withColumn("n_qstop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .withColumn("ra",
            col("n_words") >= 20L && col("n_words") <= 90L
              && col("n_wchars") >= lit(3L) * col("n_words")
              && col("n_wchars") <= lit(10L) * col("n_words")
              && lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")
              && lit(10L) * col("n_sym") <= col("n_words")
              && col("n_gstop") >= 2L)
          .withColumn("q6",
            floor((lit(0.4) * least(lit(1.0), col("n_words").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_qstop").cast("double") / col("n_words")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long"))
          .withColumn("rb", col("q6") >= 500000L)
        m.agg(
            count(lit(1)).as("n"),
            sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
            sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
            sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"),
            sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"))
          .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
            ((col("n11") + col("n00")).cast("double") / col("n").cast("double")).as("po"),
            when(col("n") * col("n")
                === (col("n11") + col("n10")) * (col("n11") + col("n01"))
                  + (col("n01") + col("n00")) * (col("n10") + col("n00")), lit(0.0))
              .otherwise(
                (col("n") * (col("n11") + col("n00"))
                  - ((col("n11") + col("n10")) * (col("n11") + col("n01"))
                    + (col("n01") + col("n00")) * (col("n10") + col("n00")))).cast("double")
                  / (col("n") * col("n")
                    - ((col("n11") + col("n10")) * (col("n11") + col("n01"))
                      + (col("n01") + col("n00")) * (col("n10") + col("n00")))).cast("double"))
              .as("kappa"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
           |                  length(text) AS nc FROM documents),
           |m AS (SELECT doc_id,
           |             CAST(len(toks) AS BIGINT) AS n_words,
           |             CAST(nc - (len(toks) - 1) AS BIGINT) AS n_wchars,
           |             CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
           |             CAST(len(list_filter(toks, w -> w IN ($GopherStopSql))) AS BIGINT) AS n_gstop,
           |             CAST(nc - length(replace(replace(text, '#', ''), '…', '')) AS BIGINT) AS n_sym,
           |             len(list_filter(toks, w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")}))) AS n_qstop,
           |             nc AS n_chars2
           |      FROM t),
           |lab AS (SELECT
           |          (n_words >= 20 AND n_words <= 90
           |           AND n_wchars >= 3 * n_words AND n_wchars <= 10 * n_words
           |           AND 5 * n_alpha >= 4 * n_words
           |           AND 10 * n_sym <= n_words
           |           AND n_gstop >= 2) AS ra,
           |          CAST(floor((0.4 * least(1.0, CAST(n_words AS DOUBLE) / 50.0)
           |               + 0.3 * (1.0 - CAST(n_qstop AS DOUBLE) / n_words)
           |               + 0.3 * least(1.0, CAST(n_chars2 AS DOUBLE) / 200.0))
           |               * 1000000.0) AS BIGINT) >= 500000 AS rb
           |        FROM m),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
           |             CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           |             CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           |             CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n00
           |      FROM lab)
           |SELECT n, n11, n10, n01, n00,
           |       CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           |       CASE WHEN n * n = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
           |            THEN 0.0
           |            ELSE CAST(n * (n11 + n00)
           |                      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
           |                 / CAST(n * n
           |                      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
           |       END AS kappa
           |FROM a""".stripMargin)),

    // ---- per-source unigram KL divergence to the corpus ------------------
    // D_KL(p_source ‖ p_corpus) = Σ_t (c_st/n_s)·[ln(c_st/n_s) − ln(c_t/n_c)]
    // — the "how far is this domain from the mixture" number that motivates
    // per-source temperature in mix_weights. No smoothing needed: the
    // source distribution's support is a subset of the corpus support by
    // construction, so every term is finite.
    //
    // Scale shape: ONE corpus token pass aggregated by (source, tok); the
    // per-source totals (#sources rows) broadcast back; the corpus term
    // counts derive from the SAME (source, tok) agg grouped by tok (vocab-
    // sized — never a second corpus pass), joined un-hinted like tfidf; the
    // grand total is a 1-row broadcast. Linear in corpus size, state is
    // vocab-sized.
    //
    // ENGINE-VERSION-PROOF (r8): both lns come from [[LnGrid]]'s
    // fixed-point integer chain — grid values subtract exactly as int64,
    // × exact count c_st stays exact, the int sum is order-independent,
    // and the final normalize is one bare division by the exact n_s·10^6.
    "source_kl" -> Q(
      fn = (s, dir) => {
        val st = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c_st"))
        val srcTot = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
        val vocab = st.groupBy("tok").agg(sum(col("c_st")).as("c_t"))
        val tot = vocab.agg(sum(col("c_t")).as("n_c"))
        val j0 = st.join(broadcast(srcTot), Seq("source"))
          .join(vocab, Seq("tok")) // un-hinted: vocab-sized (see tfidf)
          .crossJoin(broadcast(tot))
        val j1 = LnGrid.withLn6(j0, col("c_st"), col("n_s"), "ls6", "__ks_")
        val j2 = LnGrid.withLn6(j1, col("c_t"), col("n_c"), "lc6", "__kc_")
        j2.select(col("source"), col("n_s"),
            (col("c_st") * (col("ls6") - col("lc6"))).as("k6"))
          .groupBy("source", "n_s")
          .agg(sum(col("k6")).as("sk"))
          .select(col("source"), col("n_s").as("n_tokens"),
            (col("sk").cast("double")
              / (col("n_s") * lit(1000000L)).cast("double")).as("kl_nats"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
           |       FROM t GROUP BY source, tok),
           |srct AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
           |vocab AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok),
           |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_c FROM vocab),
           |j AS (SELECT st.source, c_st, n_s, c_t, n_c
           |      FROM st JOIN srct USING (source) JOIN vocab USING (tok), tot),
           |${LnGrid.sqlCtes("j", "c_st", "n_s", "ls6", "ks_")},
           |${LnGrid.sqlCtes("ks_out", "c_t", "n_c", "lc6", "kc_")}
           |SELECT source, n_s AS n_tokens,
           |       CAST(SUM(c_st * (ls6 - lc6)) AS DOUBLE)
           |         / CAST(n_s * 1000000 AS DOUBLE) AS kl_nats
           |FROM kc_out GROUP BY source, n_s ORDER BY source""".stripMargin)),

    // ---- pairwise source Jensen–Shannon divergence matrix (added r7) -----
    // The symmetric, bounded complement to source_kl: JSD(p_a ‖ p_b) for
    // every source pair — 0 for identical unigram mixes, ln 2 for disjoint
    // support. source_kl ranks each source against the corpus MIXTURE
    // (which its own mass is part of); the pairwise matrix is what mix
    // design actually reads for redundant-source pruning — two domains can
    // both sit near the mixture yet be near-identical to EACH OTHER (drop
    // one), or both far (keep both). Lexical twin of source_centroid_sim.
    //
    // Algebra that keeps the ln-grid sound: with p = c_a/n_a, q = c_b/n_b,
    //   JSD = [Σ_t c_a·ln(2·c_a·n_b / (c_a·n_b + c_b·n_a))] / (2·n_a)
    //       + [Σ_t c_b·ln(2·c_b·n_a / (c_a·n_b + c_b·n_a))] / (2·n_b)
    // ENGINE-VERSION-PROOF (r8): each mixture term is
    // [[LnGrid.withLn6Wide]]'s fixed-point integer value over the exact
    // int64 cross-products x = c_a·n_b, y = c_b·n_a (the wide variant —
    // products exceed the ratio form's 9.2e9 operand bound); weighted by
    // the exact count, summed as int64. Terms where the OTHER source lacks
    // the token collapse to ln 2, so the inner join suffices: the
    // missing-token mass (n_a − Σ_shared c_a) enters as one exact integer
    // times the grid constant 693147 (= ⌊ln2·10^6⌋, an integer literal on
    // both engines — no libm call to diverge). Final emit: two bare
    // divisions by the exact 2·n·10^6 plus one double add. Overflow
    // bounds (r7 advice — Spark ANSI and DuckDB both RAISE on int64
    // overflow rather than silently wrapping, so a breach is loud, but
    // design for headroom): x, 2x, x+y need c·n < 2^61 (per-source token
    // totals to ~1.5e9 with counts to 10^3, or any mix whose product
    // stays under 2.3e18); beyond that widen x/y to DECIMAL(38,0) and
    // shift the wide chain's input down by a tracked power of two.
    //
    // Scale shape: ONE corpus token pass → (source, tok) agg; the pair
    // term-join is keyed on tok with fan-out ≤ #sources per key (vocab-
    // sized × S² worst case — sources are a config-scale set, ≤ dozens);
    // per-source totals broadcast. No corpus-sized shuffle after the agg.
    "source_jsd_matrix" -> Q(
      fn = (s, dir) => {
        val st = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val srcTot = st.groupBy("source").agg(sum(col("c")).as("n"))
        val a = st.select(col("source").as("source_a"), col("tok"), col("c").as("c_a"))
        val b = st.select(col("source").as("source_b"), col("tok"), col("c").as("c_b"))
        val j0 = a.join(b, Seq("tok")).filter(col("source_a") < col("source_b"))
          .join(broadcast(srcTot.select(col("source").as("source_a"), col("n").as("n_a"))), Seq("source_a"))
          .join(broadcast(srcTot.select(col("source").as("source_b"), col("n").as("n_b"))), Seq("source_b"))
          .withColumn("x", col("c_a") * col("n_b"))
          .withColumn("y", col("c_b") * col("n_a"))
        val j1 = LnGrid.withLn6Wide(j0, col("x") * 2L, col("x") + col("y"), "ta6", "__ja_")
        val j2 = LnGrid.withLn6Wide(j1, col("y") * 2L, col("x") + col("y"), "tb6", "__jb_")
        val shared = j2
          .groupBy("source_a", "source_b", "n_a", "n_b")
          .agg(
            sum(col("c_a")).as("sa"),
            sum(col("c_b")).as("sb"),
            sum(col("c_a") * col("ta6")).as("ta"),
            sum(col("c_b") * col("tb6")).as("tb"))
        shared
          .select(col("source_a"), col("source_b"),
            ((col("ta") + (col("n_a") - col("sa")) * lit(693147L)).cast("double")
              / (col("n_a") * lit(2000000L)).cast("double")
              + (col("tb") + (col("n_b") - col("sb")) * lit(693147L)).cast("double")
                / (col("n_b") * lit(2000000L)).cast("double")).as("jsd_nats"))
          .orderBy("source_a", "source_b")
      },
      oracle = Some(
        s"""WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY source, tok),
           |srct AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY source),
           |j AS (SELECT a.source AS source_a, b.source AS source_b,
           |             na.n AS n_a, nb.n AS n_b, a.c AS c_a, b.c AS c_b,
           |             a.c * nb.n AS x, b.c * na.n AS y
           |      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
           |      JOIN srct na ON na.source = a.source
           |      JOIN srct nb ON nb.source = b.source),
           |${LnGrid.sqlCtesWide("j", "x * 2", "x + y", "ta6", "ja_")},
           |${LnGrid.sqlCtesWide("ja_out", "y * 2", "x + y", "tb6", "jb_")},
           |sh AS (SELECT source_a, source_b, n_a, n_b,
           |              CAST(SUM(c_a) AS BIGINT) AS sa, CAST(SUM(c_b) AS BIGINT) AS sb,
           |              CAST(SUM(c_a * ta6) AS BIGINT) AS ta,
           |              CAST(SUM(c_b * tb6) AS BIGINT) AS tb
           |       FROM jb_out GROUP BY source_a, source_b, n_a, n_b)
           |SELECT source_a, source_b,
           |       CAST(ta + (n_a - sa) * 693147 AS DOUBLE)
           |         / CAST(n_a * 2000000 AS DOUBLE)
           |       + CAST(tb + (n_b - sb) * 693147 AS DOUBLE)
           |         / CAST(n_b * 2000000 AS DOUBLE) AS jsd_nats
           |FROM sh ORDER BY source_a, source_b""".stripMargin)),

    // ---- source centroid similarity in embedding space -------------------
    // The semantic complement of source_overlap's lexical Jaccard: pairwise
    // cosine between per-source MEAN embeddings (documents ⋈ embeddings on
    // doc_id = vec_id — sources without embedded docs drop out). Two
    // domains can share no 5-grams yet be semantically near; this matrix
    // catches that for mix design / redundant-source pruning (the SemDeDup
    // idea lifted from documents to whole domains).
    //
    // Float parity — FULLY EXACT until the last four scalar ops: each float
    // element quantizes to exact micro-units (floor(x·1e6) — one correctly-
    // rounded double multiply, then an exact floor; both engines identical),
    // per-(source, dim) sums are exact BIGINTs, and because cosine is
    // scale-invariant the ÷n of the mean cancels — the SUM vector IS the
    // centroid. Pair dot/norm terms are exact DECIMAL(38,0) products of
    // those bigints (≤ ~2.5e21 at 1000× this corpus — far inside 10^38)
    // summed exactly, so aggregation order cannot matter; the final
    // cos = dot / (√na · √nb) is one identical double chain on both
    // engines. The 6dp ln-grid isn't even needed here.
    //
    // Scale shape: the doc⋈emb join is key-co-partitioned (both sides keyed
    // by the doc id — bucketable at rest); the 64× posexplode feeds a
    // (source, dim) partial agg, so the shuffle after map-side combine
    // carries ≤ #sources × 64 rows regardless of corpus size; everything
    // after is arithmetic on a ≤ S×64 table (S ≤ 20) — the pair join is
    // broadcast-trivial. One corpus pass, constant driver state.
    "source_centroid_sim" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding"))
        val cent = docs.join(emb, Seq("doc_id"))
          .select(col("source"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("source"), col("pos"),
            floor(col("x").cast("double") * lit(1000000.0d)).as("micro"))
          .groupBy("source", "pos").agg(sum(col("micro")).as("sv"))
        val norms = cent.groupBy("source")
          .agg(sum(col("sv").cast("decimal(19,0)") * col("sv").cast("decimal(19,0)")).as("n2"))
        val a = cent.select(col("source").as("source_a"), col("pos"), col("sv").as("sa"))
        val b = cent.select(col("source").as("source_b"), col("pos"), col("sv").as("sb"))
        a.join(b, Seq("pos")).filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(sum(col("sa").cast("decimal(19,0)") * col("sb").cast("decimal(19,0)")).as("dot"))
          .join(broadcast(norms.select(col("source").as("source_a"), col("n2").as("na"))), Seq("source_a"))
          .join(broadcast(norms.select(col("source").as("source_b"), col("n2").as("nb"))), Seq("source_b"))
          .filter(col("na") > 0 && col("nb") > 0)
          .select(col("source_a"), col("source_b"),
            (col("dot").cast("double")
              / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
              .as("centroid_cos"))
          .orderBy("source_a", "source_b")
      },
      oracle = Some(
        """WITH j AS (
          |  SELECT d.source, e.embedding
          |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
          |el AS (
          |  SELECT source, UNNEST(range(1, 65)) AS pos, embedding FROM j),
          |cent AS (
          |  SELECT source, pos,
          |         CAST(SUM(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sv
          |  FROM el GROUP BY source, pos),
          |norms AS (
          |  SELECT source, SUM(CAST(sv AS DECIMAL(19,0)) * CAST(sv AS DECIMAL(19,0))) AS n2
          |  FROM cent GROUP BY source),
          |pairs AS (
          |  SELECT a.source AS source_a, b.source AS source_b,
          |         SUM(CAST(a.sv AS DECIMAL(19,0)) * CAST(b.sv AS DECIMAL(19,0))) AS dot
          |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.source < b.source
          |  GROUP BY a.source, b.source)
          |SELECT source_a, source_b,
          |       CAST(dot AS DOUBLE)
          |         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS centroid_cos
          |FROM pairs
          |JOIN norms na ON na.source = source_a
          |JOIN norms nb ON nb.source = source_b
          |WHERE na.n2 > 0 AND nb.n2 > 0
          |ORDER BY source_a, source_b""".stripMargin)))

  // ---- easy-first curriculum schedule (composed) -------------------------
  // Curriculum learning's data-ordering half (Bengio et al. 2009, applied
  // to LLM pretraining data): emit a global training position where all
  // head-tercile (easiest/most-fluent) documents come first, then middle,
  // then tail, with a seeded deterministic shuffle INSIDE each tercile
  // (adjacent docs must not correlate). Composed from the gated
  // quality_buckets (the tercile) and the shuffle_deterministic stitch
  // (the no-global-sort rank) — defined outside the base map literal for
  // the same val-init reason as SimilarityQueries.recall_at_k.
  //
  // Scale shape: the rank is stitched over (tercile, md5-hex-prefix)
  // shards — 3×16 bounded partitions, each windowed locally, offsets from
  // a ≤48-row broadcast running sum — so no single-reducer global sort at
  // any corpus size; quality_buckets' own stitch is already scale-safe.
  //
  // Float parity: none needed beyond quality_buckets' — the schedule is
  // md5 + integer ranks.
  val all: Map[String, Q] = base ++ Map("curriculum_schedule" -> Q(
    fn = (s, dir) => {
      val q = base("quality_buckets").fn(s, dir)
        .select(col("doc_id"), col("ppl_bucket"))
        .withColumn("b",
          when(col("ppl_bucket") === "head", 0)
            .when(col("ppl_bucket") === "middle", 1).otherwise(2))
        .withColumn("k",
          md5(concat(lit("curriculum:42:"), col("doc_id").cast("string"))))
        .withColumn("shard", substring(col("k"), 1, 1))
      val rn = q.withColumn("rn", row_number().over(
        Window.partitionBy("b", "shard").orderBy(col("k"), col("doc_id"))))
      // ≤48-row offsets frame: the global window is bounded by construction
      val offsets = q.groupBy("b", "shard").agg(count(lit(1)).as("cnt"))
        .withColumn("off",
          coalesce(sum(col("cnt")).over(
            Window.orderBy(col("b"), col("shard"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      rn.join(broadcast(offsets), Seq("b", "shard"))
        .select(col("doc_id"), col("ppl_bucket"), (col("off") + col("rn")).as("pos"))
        .orderBy("doc_id")
    },
    oracle = Some(
      s"""WITH qb AS (${base("quality_buckets").oracle.get}),
         |keyed AS (
         |  SELECT doc_id, ppl_bucket,
         |         CASE ppl_bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END AS b,
         |         md5('curriculum:42:' || CAST(doc_id AS VARCHAR)) AS k
         |  FROM qb)
         |SELECT doc_id, ppl_bucket,
         |       CAST(ROW_NUMBER() OVER (ORDER BY b, k, doc_id) AS BIGINT) AS pos
         |FROM keyed ORDER BY doc_id""".stripMargin)),

  // ---- quality × duplication cross-audit (composed, added r7) -----------
  // The curation sanity check the CCNet and Lee-et-al lines both predict:
  // lower-fluency terciles should carry MORE duplicated text (boilerplate
  // is both dupy and low-quality). Per quality tercile: doc count and the
  // corpus-level duplicated-occurrence rate Σn_dup / Σn_ngrams — composed
  // from the gated quality_buckets and dup_ngram_ratio (builders reused,
  // oracles nested as CTEs — the recall_at_k no-drift discipline), so this
  // audit can never disagree with the operators it summarizes. Docs under
  // 5 tokens are absent from dup_ngram_ratio and drop from the join on
  // both engines identically.
  //
  // Float parity: the per-doc dup_ratio doubles are NEVER averaged (a
  // double mean is aggregation-order-dependent); the tercile rate is
  // recomputed from the exact integer count sums — one bare division.
  // Scale shape: both inputs' own plans + a doc-keyed join and a 3-row agg.
  "quality_dup_profile" -> Q(
    fn = (s, dir) => {
      val qb = base("quality_buckets").fn(s, dir).select(col("doc_id"), col("ppl_bucket"))
      val dup = base("dup_ngram_ratio").fn(s, dir)
        .select(col("doc_id"), col("n_ngrams"), col("n_dup"))
      qb.join(dup, Seq("doc_id"))
        .groupBy("ppl_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ngrams")).as("n_ngrams"),
          sum(col("n_dup")).as("n_dup"))
        .select(col("ppl_bucket"), col("n_docs"), col("n_ngrams"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_ngrams")).as("dup_rate"))
        .orderBy("ppl_bucket")
    },
    oracle = Some(
      s"""WITH qb AS (${base("quality_buckets").oracle.get}),
         |dup AS (${base("dup_ngram_ratio").oracle.get})
         |SELECT ppl_bucket, COUNT(*) AS n_docs,
         |       CAST(SUM(n_ngrams) AS BIGINT) AS n_ngrams,
         |       CAST(SUM(n_dup) AS BIGINT) AS n_dup,
         |       CAST(SUM(n_dup) AS DOUBLE) / SUM(n_ngrams) AS dup_rate
         |FROM qb JOIN dup USING (doc_id)
         |GROUP BY ppl_bucket ORDER BY ppl_bucket""".stripMargin)),

  // ---- deterministic weighted reservoir sample (added r9) ----------------
  // Weighted sampling WITHOUT replacement — the A-ES/A-ExpJ family
  // (Efraimidis & Spirakis 2006): per source, the k = 5 documents with the
  // best priority u^(1/w) (u uniform, w = n_chars), i.e. the smallest
  // (−ln u)/w — longer documents proportionally likelier, yet any doc can
  // win. THE missing half of the sampling surface: reservoir_sample is
  // uniform, sample_temperature reweights BETWEEN sources; this picks
  // WITHIN a source by token mass (the "sample exemplars proportional to
  // training contribution" curation verb). Deterministic end-to-end: u is
  // the 24-bit md5 of (seed ∥ doc_id) + 1, −ln u rides [[LnGrid]]
  // (nlu6 = ln6(2²⁴, u) ≥ 0), and the selection key is the exact integer
  // priority6 = (nlu6·10⁶) div w with doc_id tie-break — both engines walk
  // the identical grid order (the theil_sen key discipline; rerun-identity
  // on any engine/partitioning, zero float surface).
  //
  // Scale shape: map-only hash + Ln6 kernel per row, then rank ≤ k per
  // source compiles to WindowGroupLimit map-side pruning (the
  // reservoir_sample precedent) — the shuffle carries ≤ k·|sources| rows
  // per task, a reducer never sees the corpus.
  "weighted_reservoir" -> Q(
    fn = (s, dir) => {
      val hexSum = (0 until 6).map { i =>
        s"(instr('0123456789abcdef', substring(dg, ${i + 1}, 1)) - 1) * ${1L << (4 * (5 - i))}"
      }.mkString(" + ")
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        // w = n_chars must be ≥ 1: a zero-length doc would make priority6
        // NULL (÷0), and NULL ordering DIVERGES cross-engine (Spark ASC =
        // NULLS FIRST, DuckDB = NULLS LAST) — excluded in both engines
        .filter(col("n_chars") >= 1)
        .withColumn("dg", md5(concat(lit("wres:42|"), col("doc_id").cast("string"))))
        .withColumn("u", expr(hexSum) + 1L)
      val keyed = graft.queries.LnGrid.withLn6(d, lit(1L << 24), col("u"), "nlu6")
        .withColumn("priority6", expr("(nlu6 * 1000000L) div n_chars"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("priority6"), col("doc_id"))
      keyed.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"),
          col("n_chars").as("weight"), col("priority6"))
        .orderBy("source", "rk")
    },
    oracle = Some {
      val hexSum = (0 until 6).map { i =>
        s"(strpos('0123456789abcdef', substring(dg, ${i + 1}, 1)) - 1) * ${1L << (4 * (5 - i))}"
      }.mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, source, n_chars,
         |         md5('wres:42|' || CAST(doc_id AS VARCHAR)) AS dg
         |  FROM documents WHERE n_chars >= 1),
         |du AS (SELECT *, CAST($hexSum AS BIGINT) + 1 AS u FROM d),
         |${graft.queries.LnGrid.sqlCtes("du", "16777216", "u", "nlu6", "wr_")},
         |keyed AS (SELECT doc_id, source, n_chars,
         |                 (nlu6 * 1000000) // n_chars AS priority6
         |          FROM wr_out),
         |ranked AS (SELECT *,
         |                  ROW_NUMBER() OVER (PARTITION BY source
         |                      ORDER BY priority6, doc_id) AS rk
         |           FROM keyed)
         |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id,
         |       n_chars AS weight, priority6
         |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin
    }),

  // ---- stratified k-fold assignment audit (added r9) ---------------------
  // Deterministic 5-fold cross-validation assignment by md5 hash band —
  // train_split's 80/10/10 machinery generalized to the k-fold eval setup:
  // fold = (h2·5) div 256 over the first-2-hex-chars band (sizes
  // 52/51/51/51/51 of 256 ≈ 20% each), so assignment is a pure function
  // of doc_id — stable under corpus growth (the train_split proof) and
  // engine-independent (integer band arithmetic, no float). The audit
  // emits the (fold, source) balance table a CV harness checks before
  // trusting fold-to-fold variance: doc and token mass per cell plus the
  // realized within-source fraction (ONE bare division) — a source
  // concentrated in one fold makes that fold's eval unrepresentative.
  //
  // Scale shape: map-side band arithmetic → one (fold, source) agg with
  // map-side combine → broadcast per-source totals; ≤ 5·|sources| rows.
  "stratified_kfold" -> Q(
    fn = (s, dir) => {
      val h2 = "(instr('0123456789abcdef', substring(dg, 1, 1)) - 1) * 16 " +
        "+ (instr('0123456789abcdef', substring(dg, 2, 1)) - 1)"
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("dg", md5(concat(lit("kfold:"), col("doc_id").cast("string"))))
        .withColumn("fold", expr(s"(($h2) * 5) div 256"))
      val cell = d.groupBy("fold", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      val tot = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      cell.join(broadcast(tot), Seq("source"))
        .select(col("fold"), col("source"), col("n_docs"), col("n_tokens"),
          (col("n_docs").cast("double") / col("n_src").cast("double"))
            .as("frac_of_source"))
        .orderBy("fold", "source")
    },
    oracle = Some {
      val h2 = "(strpos('0123456789abcdef', substring(dg, 1, 1)) - 1) * 16 " +
        "+ (strpos('0123456789abcdef', substring(dg, 2, 1)) - 1)"
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         md5('kfold:' || CAST(doc_id AS VARCHAR)) AS dg
         |  FROM documents),
         |f AS (SELECT *, (($h2) * 5) // 256 AS fold FROM d),
         |cell AS (SELECT fold, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |         FROM f GROUP BY fold, source),
         |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
         |        FROM f GROUP BY source)
         |SELECT CAST(fold AS BIGINT) AS fold, cell.source, n_docs, n_tokens,
         |       CAST(n_docs AS DOUBLE) / CAST(n_src AS DOUBLE) AS frac_of_source
         |FROM cell JOIN tot ON cell.source = tot.source
         |ORDER BY fold, cell.source""".stripMargin
    }),

    // ---- sample-ratio-mismatch check on the train split (added r10) -------
    // The SRM gate every experimentation/data platform runs before
    // trusting a split: do train_split's REALIZED counts match the
    // designed 204/26/26-of-256 hash-band weights? χ² = Σ(256·obs −
    // n·w)²/(256·n·w) over the three cells — the DIFFERENCE 256·obs−n·w
    // is exact int64 (safe to n ≈ 3.6e16 docs; the 256-denominator
    // cross-multiplication keeps the expectation rational), then cast to
    // double BEFORE squaring: for a grossly broken split the difference
    // reaches ~256·n, whose int64 square wraps at n ≈ 1.2e8 — exactly
    // when the gate must fire (ADVICE r10). The denominator n·(256·w) is
    // likewise a double-first multiply (int64 wraps at n ≈ 1.7e14 —
    // R12BatchSpec's sweep finding; bit-identical below 2^53). The square, the three
    // divisions + two adds are a fixed chain of correctly-rounded IEEE
    // ops (the token_budget_plan doctrine; no fold-order ambiguity
    // because the cells are pivoted to columns).
    // χ² > 5.99 (df = 2, α = .05) flags the split as broken — with a
    // pure hash assignment this only fires on an implementation bug,
    // which is exactly what a gate is for.
    //
    // Scale shape: map-side band arithmetic → one 3-row agg pivoted to a
    // single row — scan-bound at any corpus size.
    "ab_srm_check" -> Q(
      fn = (s, dir) => {
        val assigned = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
          .withColumn("split",
            when(col("h2") < "cc", "train")
              .when(col("h2") < "e6", "val").otherwise("test"))
        assigned.agg(count(lit(1)).as("n"),
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("o_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("o_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L)).as("o_test"))
          .filter(col("n") > 0)
          .select(col("n"), col("o_train"), col("o_val"), col("o_test"),
            (srmTerm(col("o_train"), 204L) + srmTerm(col("o_val"), 26L)
              + srmTerm(col("o_test"), 26L)).as("chi2"))
          .select(col("n"), col("o_train"), col("o_val"), col("o_test"),
            col("chi2"), (col("chi2") > 5.99).as("srm_flag"))
      },
      oracle = Some(
        """WITH a AS (
          |  SELECT CASE WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'cc' THEN 'train'
          |              WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'e6' THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM documents),
          |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS o_train,
          |             CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS o_val,
          |             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS o_test
          |      FROM a),
          |c AS (SELECT *,
          |        CAST(o_train * 256 - n * 204 AS DOUBLE) * CAST(o_train * 256 - n * 204 AS DOUBLE)
          |          / (CAST(n AS DOUBLE) * (256 * 204))
          |        + CAST(o_val * 256 - n * 26 AS DOUBLE) * CAST(o_val * 256 - n * 26 AS DOUBLE)
          |          / (CAST(n AS DOUBLE) * (256 * 26))
          |        + CAST(o_test * 256 - n * 26 AS DOUBLE) * CAST(o_test * 256 - n * 26 AS DOUBLE)
          |          / (CAST(n AS DOUBLE) * (256 * 26)) AS chi2
          |      FROM m WHERE n > 0)
          |SELECT n, o_train, o_val, o_test, chi2, chi2 > 5.99 AS srm_flag
          |FROM c""".stripMargin)),

    // ---- Cochran-Mantel-Haenszel test: length x quality across sources ----
    // (added r12) The stratified 2x2 association test every A/B and data-
    // audit stack keeps beside the chi-square: is document LENGTH
    // (n_chars >= 200) associated with the Gopher stopword-quality signal
    // (>= 2 canonical stopwords) AFTER controlling for source? Pooling
    // sources can manufacture or mask the association (Simpson; the
    // companion query below shows the per-stratum signs) — CMH sums
    // per-stratum evidence instead: chi2 = (SUM a_i − SUM E_i)² / SUM V_i
    // with E_i = n1·m1/n and V_i = n1·n0·m1·m0 / (n²(n−1)).
    // Exact surface: E and V ride the micro grid — e6 = (n1·m1·10⁶) div n,
    // v6 = (n1·n0·m1·m0·10⁶) div (n²(n−1)) — numerators widened to
    // DECIMAL(38,0)/HUGEINT (n1·n0·m1·m0 is ~n⁴, wrapping int64 past
    // n ≈ 55k docs per stratum); per-stratum e6/v6 are int64, their sums
    // are exact (≤ N·10⁶ — int64-safe to N ≈ 9e12 docs, documented); the
    // chi2 is then ONE fixed correctly-rounded chain: diff cast to double
    // BEFORE squaring (the ab_srm lesson), one multiply, one division.
    // Strata with n < 2 or a degenerate margin contribute zero evidence
    // (v6 = 0) and are excluded, matching the estimator's definition.
    //
    // Scale shape: one map-side tokenize+flag pass → per-source partial
    // agg (map-side combined, ≤|sources| rows) → 1-row roll-up. Scan-bound
    // at any corpus size.
    "cmh_test" -> Q(
      fn = (s, dir) => {
        val cells = lenQuality2x2(Tables.load(s, dir, "documents"))
          .filter(col("n") >= 2 && col("n1") > 0 && col("n1") < col("n")
            && col("m1") > 0 && col("m1") < col("n"))
          .select(col("a"),
            expr("(cast(n1 as decimal(38,0)) * m1 * 1000000) div n").as("e6"),
            expr("""(cast(n1 as decimal(38,0)) * (n - n1) * m1 * (n - m1) * 1000000)
                   | div (cast(n as decimal(38,0)) * n * (n - 1))""".stripMargin).as("v6"))
        cells.agg(count(lit(1)).as("k_strata"),
            sum(col("a")).as("sum_a"),
            sum(expr("cast(e6 as decimal(38,0))")).as("se6"),
            sum(expr("cast(v6 as decimal(38,0))")).as("sv6"))
          .select(col("k_strata"), col("sum_a"),
            expr("cast(se6 as bigint)").as("sum_e6"),
            expr("cast(sv6 as bigint)").as("sum_v6"),
            (expr("cast(cast(sum_a as decimal(38,0)) * 1000000 - se6 as double)")
              * expr("cast(cast(sum_a as decimal(38,0)) * 1000000 - se6 as double)")
              / expr("cast(sv6 * 1000000 as double)")).as("chi2_cmh"))
          .select(col("k_strata"), col("sum_a"), col("sum_e6"), col("sum_v6"),
            col("chi2_cmh"), (col("chi2_cmh") > 3.84).as("assoc_flag"))
      },
      oracle = Some(
        s"""WITH cells AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |         CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
           |         CAST(SUM(CASE WHEN n_chars >= 200
           |                AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS a
           |  FROM documents GROUP BY source),
           |ev AS (SELECT a,
           |              (CAST(n1 AS HUGEINT) * m1 * 1000000) // n AS e6,
           |              (CAST(n1 AS HUGEINT) * (n - n1) * m1 * (n - m1) * 1000000)
           |                // (CAST(n AS HUGEINT) * n * (n - 1)) AS v6
           |       FROM cells
           |       WHERE n >= 2 AND n1 > 0 AND n1 < n AND m1 > 0 AND m1 < n),
           |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_strata,
           |             CAST(SUM(a) AS BIGINT) AS sum_a,
           |             SUM(CAST(e6 AS HUGEINT)) AS se6,
           |             SUM(CAST(v6 AS HUGEINT)) AS sv6
           |      FROM ev),
           |c AS (SELECT k_strata, sum_a,
           |             CAST(se6 AS BIGINT) AS sum_e6, CAST(sv6 AS BIGINT) AS sum_v6,
           |             CAST(CAST(sum_a AS HUGEINT) * 1000000 - se6 AS DOUBLE)
           |               * CAST(CAST(sum_a AS HUGEINT) * 1000000 - se6 AS DOUBLE)
           |               / CAST(sv6 * 1000000 AS DOUBLE) AS chi2_cmh
           |      FROM m)
           |SELECT k_strata, sum_a, sum_e6, sum_v6, chi2_cmh,
           |       chi2_cmh > 3.84 AS assoc_flag
           |FROM c""".stripMargin)),

    // ---- Otsu adaptive quality threshold (r12) ----------------------------
    // Every curation deck hand-picks its quality cutoff (the 0.55 in
    // pipeline_curation); Otsu's method (1979) picks it FROM THE DATA: the
    // threshold over the quality-score histogram that maximizes the
    // between-class variance (M0·w1 − M1·w0)²/(w0·w1) — the classic
    // bimodal-separation criterion, here over the 101-level q6 div 10⁴
    // band grid of the shared composite quality score. Exact surface:
    // band/count/moment sums are int64; the score rides DECIMAL(38,0) with
    // an explicit bound (numerator ≲ 10⁴·n⁴ → exact to n ≈ 5.6e8 docs;
    // beyond that pre-scale the band counts — the argmax is invariant to
    // uniform count scaling); argmax via max(struct(score, −band)) takes
    // the SMALLEST band on ties; class means are the two bare divisions.
    //
    // Scale shape: one map-side score pass → ≤101-row band agg → ONE
    // cumulative window over the band grid (R2-whitelisted, bound 101) →
    // 1-row argmax roll-up with a 1-row totals broadcast (R1).
    "otsu_quality_threshold" -> Q(
      fn = (s, dir) => otsuBand(Tables.load(s, dir, "documents")),
      oracle = Some(
        s"""WITH $otsuSqlCtes
           |SELECT g AS best_band, w0 AS n_below, ww - w0 AS n_above,
           |       CAST(m0 AS DOUBLE) / CAST(w0 AS DOUBLE) AS mean_band_below,
           |       CAST(mm - m0 AS DOUBLE) / CAST(ww - w0 AS DOUBLE) AS mean_band_above,
           |       CAST(score AS BIGINT) AS between_var_score
           |FROM best""".stripMargin)),

    // ---- Mantel-Haenszel common odds ratio on the same 2x2 family (r12) ---
    // cmh_test answers IS there a length-quality association after
    // controlling for source; this is the companion ESTIMATE of HOW BIG:
    // OR_MH = Σ_i(a_i·d_i/n_i) / Σ_i(b_i·c_i/n_i) — the inverse-variance-
    // flavored pooled odds ratio that, unlike the raw pooled table, cannot
    // manufacture association from stratum-size imbalance (the same
    // Simpson immunity as the test). Same shared lenQuality2x2 cells:
    // a = both, b = len-only = n1−a, c = qual-only = m1−a, d = neither.
    // Exact surface: each stratum term rides the micro grid — (a·d·10⁶)
    // div n and (b·c·10⁶) div n, DECIMAL/HUGEINT-widened products
    // (a·d ~ n²/4 wraps int64 past ~6M-doc strata) with int64 div
    // results; the sums are exact; OR is the ONE bare division. A zero
    // discordant sum reports NULL (the estimator is undefined, not ∞).
    //
    // Scale shape: the shared map pass → ≤|sources| agg → 1-row roll-up;
    // scan-bound.
    "mh_odds_ratio" -> Q(
      fn = (s, dir) => {
        val cells = lenQuality2x2(Tables.load(s, dir, "documents"))
          .filter(col("n") > 0)
          .select(col("a"), (col("n1") - col("a")).as("b"),
            (col("m1") - col("a")).as("c"),
            (col("n") - col("n1") - col("m1") + col("a")).as("d"), col("n"))
          .select(
            expr("(cast(a as decimal(38,0)) * d * 1000000) div n").as("ad6"),
            expr("(cast(b as decimal(38,0)) * c * 1000000) div n").as("bc6"))
        cells.agg(count(lit(1)).as("k_strata"),
            sum(expr("cast(ad6 as decimal(38,0))")).as("sad6"),
            sum(expr("cast(bc6 as decimal(38,0))")).as("sbc6"))
          .select(col("k_strata"),
            expr("cast(sad6 as bigint)").as("sum_ad6"),
            expr("cast(sbc6 as bigint)").as("sum_bc6"),
            when(col("sbc6") === 0, lit(null).cast("double"))
              .otherwise(col("sad6").cast("double") / col("sbc6").cast("double"))
              .as("or_mh"))
      },
      oracle = Some(
        s"""WITH cells AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |         CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
           |         CAST(SUM(CASE WHEN n_chars >= 200
           |                AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS a
           |  FROM documents GROUP BY source),
           |t AS (SELECT (CAST(a AS HUGEINT) * (n - n1 - m1 + a) * 1000000) // n AS ad6,
           |             (CAST(n1 - a AS HUGEINT) * (m1 - a) * 1000000) // n AS bc6
           |      FROM cells WHERE n > 0),
           |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_strata,
           |             SUM(CAST(ad6 AS HUGEINT)) AS sad6,
           |             SUM(CAST(bc6 AS HUGEINT)) AS sbc6
           |      FROM t)
           |SELECT k_strata,
           |       CAST(sad6 AS BIGINT) AS sum_ad6, CAST(sbc6 AS BIGINT) AS sum_bc6,
           |       CASE WHEN sbc6 = 0 THEN NULL
           |            ELSE CAST(sad6 AS DOUBLE) / CAST(sbc6 AS DOUBLE) END AS or_mh
           |FROM m""".stripMargin)),

    // ---- Simpson-paradox diagnostic on the same 2x2 family (added r12) ----
    // The per-stratum companion of cmh_test: for each source, does the
    // length→quality association point the SAME WAY as the pooled table?
    // A stratum whose sign OPPOSES the pooled sign is the classic Simpson
    // flag — the pooled rate difference is a mixture artifact and any
    // length-based curation rule calibrated on the pooled table is wrong
    // for that source. Signs are EXACT: rate_e − rate_u = a/n1 − (m1−a)/n0
    // compares as sign(a·n0 − (m1−a)·n1) — one cross-multiplication,
    // widened to DECIMAL/HUGEINT (a·n0 ~ n², wraps int64 past ~3e9-doc
    // strata); no division anywhere near the hashed columns. Degenerate
    // strata (one exposure group empty) report dir 0 and never flag.
    //
    // Scale shape: the shared lenQuality2x2 map pass → ≤|sources| agg →
    // 1-row pooled broadcast back onto it. Scan-bound.
    "simpson_paradox_check" -> Q(
      fn = (s, dir) => {
        val cells = lenQuality2x2(Tables.load(s, dir, "documents"))
        val pooled = cells.agg(sum(col("n")).as("pn"), sum(col("n1")).as("pn1"),
          sum(col("m1")).as("pm1"), sum(col("a")).as("pa"))
        def dirSign(a: String, n1: String, m1: String, n: String) =
          when(col(n1) === 0L || col(n1) === col(n), lit(0))
            .otherwise(signum(expr(
              s"cast(cast($a as decimal(38,0)) * ($n - $n1) - cast(${m1} - $a as decimal(38,0)) * $n1 as double)"))
              .cast("int"))
        cells.crossJoin(broadcast(pooled))
          .select(col("source"), col("n"), col("n1"), col("m1"), col("a"),
            dirSign("a", "n1", "m1", "n").as("dir_source"),
            dirSign("pa", "pn1", "pm1", "pn").as("dir_pooled"))
          .withColumn("simpson_flag",
            col("dir_source") * col("dir_pooled") === -1)
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH cells AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |         CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
           |         CAST(SUM(CASE WHEN n_chars >= 200
           |                AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS a
           |  FROM documents GROUP BY source),
           |pooled AS (SELECT CAST(SUM(n) AS BIGINT) AS pn, CAST(SUM(n1) AS BIGINT) AS pn1,
           |                  CAST(SUM(m1) AS BIGINT) AS pm1, CAST(SUM(a) AS BIGINT) AS pa
           |           FROM cells)
           |SELECT source, n, n1, m1, a,
           |       CASE WHEN n1 = 0 OR n1 = n THEN 0
           |            ELSE CAST(sign(CAST(CAST(a AS HUGEINT) * (n - n1)
           |                 - CAST(m1 - a AS HUGEINT) * n1 AS DOUBLE)) AS INTEGER) END AS dir_source,
           |       CASE WHEN pn1 = 0 OR pn1 = pn THEN 0
           |            ELSE CAST(sign(CAST(CAST(pa AS HUGEINT) * (pn - pn1)
           |                 - CAST(pm1 - pa AS HUGEINT) * pn1 AS DOUBLE)) AS INTEGER) END AS dir_pooled,
           |       (CASE WHEN n1 = 0 OR n1 = n THEN 0
           |             ELSE CAST(sign(CAST(CAST(a AS HUGEINT) * (n - n1)
           |                  - CAST(m1 - a AS HUGEINT) * n1 AS DOUBLE)) AS INTEGER) END)
           |       * (CASE WHEN pn1 = 0 OR pn1 = pn THEN 0
           |               ELSE CAST(sign(CAST(CAST(pa AS HUGEINT) * (pn - pn1)
           |                    - CAST(pm1 - pa AS HUGEINT) * pn1 AS DOUBLE)) AS INTEGER) END)
           |       = -1 AS simpson_flag
           |FROM cells CROSS JOIN pooled
           |ORDER BY source""".stripMargin)),

    // ---- McNemar test: are the two curation rules asymmetric? (r12) -------
    // rater_agreement's kappa says how much two keep-rules AGREE; McNemar
    // asks the operational follow-up about their DISAGREEMENTS: among docs
    // where the rules differ, is one systematically stricter (b = length-
    // only-keep vs c = quality-only-keep)? Under H0 (symmetric
    // disagreement) b ~ Binomial(b+c, 1/2); chi2 = (b−c)²/(b+c), df 1.
    // Same exact 2x2 cells as cmh_test/simpson (shared lenQuality2x2 — the
    // rules can never drift apart from the tests about them): b = e∧¬o =
    // n1−a, c = ¬e∧o = m1−a. Per source plus a pooled row (source NULL,
    // ordered first). The square rides double-AFTER-cast (b−c ≤ n wraps
    // int64 squared past ~3e9-doc strata — the ab_srm lesson); b+c = 0
    // strata report NULL (no disagreement, no evidence).
    //
    // Scale shape: the shared map pass → ≤|sources| agg (+1 pooled row);
    // scan-bound at any corpus size.
    "mcnemar_test" -> Q(
      fn = (s, dir) => {
        val cells = lenQuality2x2(Tables.load(s, dir, "documents"))
        val pooled = cells.agg(sum(col("n")).as("n"), sum(col("n1")).as("n1"),
            sum(col("m1")).as("m1"), sum(col("a")).as("a"))
          .select(lit(null).cast("string").as("source"),
            col("n"), col("n1"), col("m1"), col("a"))
        cells.select(col("source"), col("n"), col("n1"), col("m1"), col("a"))
          .unionByName(pooled)
          .select(col("source"),
            (col("n1") - col("a")).as("b_len_only"),
            (col("m1") - col("a")).as("c_qual_only"))
          .withColumn("chi2_mcnemar",
            when(col("b_len_only") + col("c_qual_only") === 0L,
              lit(null).cast("double"))
              .otherwise(
                (col("b_len_only") - col("c_qual_only")).cast("double")
                  * (col("b_len_only") - col("c_qual_only")).cast("double")
                  / (col("b_len_only") + col("c_qual_only")).cast("double")))
          .withColumn("asym_flag",
            coalesce(col("chi2_mcnemar") > 3.84, lit(false)))
          .orderBy(col("source").asc_nulls_first)
      },
      oracle = Some(
        s"""WITH cells AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |         CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
           |         CAST(SUM(CASE WHEN n_chars >= 200
           |                AND len(list_filter(string_split(text, ' '),
           |                t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS a
           |  FROM documents GROUP BY source),
           |all_rows AS (
           |  SELECT source, n, n1, m1, a FROM cells
           |  UNION ALL
           |  SELECT CAST(NULL AS VARCHAR), CAST(SUM(n) AS BIGINT), CAST(SUM(n1) AS BIGINT),
           |         CAST(SUM(m1) AS BIGINT), CAST(SUM(a) AS BIGINT) FROM cells),
           |bc AS (SELECT source, n1 - a AS b_len_only, m1 - a AS c_qual_only FROM all_rows)
           |SELECT source, b_len_only, c_qual_only,
           |       CASE WHEN b_len_only + c_qual_only = 0 THEN NULL
           |            ELSE CAST(b_len_only - c_qual_only AS DOUBLE)
           |                 * CAST(b_len_only - c_qual_only AS DOUBLE)
           |                 / CAST(b_len_only + c_qual_only AS DOUBLE) END AS chi2_mcnemar,
           |       COALESCE(CASE WHEN b_len_only + c_qual_only = 0 THEN NULL
           |            ELSE CAST(b_len_only - c_qual_only AS DOUBLE)
           |                 * CAST(b_len_only - c_qual_only AS DOUBLE)
           |                 / CAST(b_len_only + c_qual_only AS DOUBLE) END > 3.84,
           |           false) AS asym_flag
           |FROM bc ORDER BY source NULLS FIRST""".stripMargin)),

    // ---- Cochran's Q: do the THREE curation rules pass equal shares? (r12) -
    // The k-treatment extension of McNemar over the same documents: rules
    // r1 = length ≥ 200, r2 = Gopher-stop ≥ 2 (the shared 2x2 pair), r3 =
    // word count ≥ 20 (gopher_rules' floor). Q = (k−1)·(k·ΣG² − (ΣG)²) /
    // (k·ΣL − ΣL²) with G_j = per-rule pass totals and L_i = per-doc pass
    // counts — EVERY term an exact integer (ΣL ≤ 3N, ΣL² ≤ 9N; k·ΣG²
    // widened to DECIMAL/HUGEINT past ~1e9 docs); Q is ONE division of two
    // exact integers, compared against the df = 2 gate. A significant Q
    // says the three rules keep meaningfully different corpus shares —
    // they are filters, not redundant spellings of one rule.
    //
    // Scale shape: one map-side 3-flag pass → 1-row aggregate; scan-bound.
    "cochran_q" -> Q(
      fn = (s, dir) => {
        val flags = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(
            when(col("n_chars") >= 200, 1L).otherwise(0L).as("r1"),
            when(expr(s"size(filter(toks, t -> t IN ($GopherStopSql))) >= 2"), 1L)
              .otherwise(0L).as("r2"),
            when(size(col("toks")) >= 20, 1L).otherwise(0L).as("r3"))
          .withColumn("l", col("r1") + col("r2") + col("r3"))
        flags.agg(count(lit(1)).as("n"),
            sum(col("r1")).as("g1"), sum(col("r2")).as("g2"), sum(col("r3")).as("g3"),
            sum(col("l")).as("sum_l"), sum(col("l") * col("l")).as("sum_l2"))
          .select(col("n"), col("g1"), col("g2"), col("g3"),
            col("sum_l"), col("sum_l2"),
            when(expr("3 * cast(sum_l as decimal(38,0)) - sum_l2 = 0"),
                lit(null).cast("double"))
              .otherwise(
                expr("""cast(2 * (3 * (cast(g1 as decimal(38,0)) * g1
                       | + cast(g2 as decimal(38,0)) * g2
                       | + cast(g3 as decimal(38,0)) * g3)
                       | - cast(sum_l as decimal(38,0)) * sum_l) as double)""".stripMargin)
                  / expr("cast(3 * cast(sum_l as decimal(38,0)) - sum_l2 as double)"))
              .as("q_stat"))
          .select(col("n"), col("g1"), col("g2"), col("g3"),
            col("sum_l"), col("sum_l2"), col("q_stat"),
            coalesce(col("q_stat") > 5.99, lit(false)).as("rules_differ_flag"))
      },
      oracle = Some(
        s"""WITH flags AS (
           |  SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS r1,
           |         CASE WHEN len(list_filter(string_split(text, ' '),
           |              t -> t IN ($GopherStopSql))) >= 2 THEN 1 ELSE 0 END AS r2,
           |         CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END AS r3
           |  FROM documents),
           |f2 AS (SELECT r1, r2, r3, r1 + r2 + r3 AS l FROM flags),
           |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(r1) AS BIGINT) AS g1, CAST(SUM(r2) AS BIGINT) AS g2,
           |             CAST(SUM(r3) AS BIGINT) AS g3,
           |             CAST(SUM(l) AS BIGINT) AS sum_l,
           |             CAST(SUM(l * l) AS BIGINT) AS sum_l2
           |      FROM f2)
           |SELECT n, g1, g2, g3, sum_l, sum_l2,
           |       CASE WHEN 3 * CAST(sum_l AS HUGEINT) - sum_l2 = 0 THEN NULL
           |            ELSE CAST(2 * (3 * (CAST(g1 AS HUGEINT) * g1
           |                 + CAST(g2 AS HUGEINT) * g2 + CAST(g3 AS HUGEINT) * g3)
           |                 - CAST(sum_l AS HUGEINT) * sum_l) AS DOUBLE)
           |              / CAST(3 * CAST(sum_l AS HUGEINT) - sum_l2 AS DOUBLE) END AS q_stat,
           |       COALESCE(CASE WHEN 3 * CAST(sum_l AS HUGEINT) - sum_l2 = 0 THEN NULL
           |            ELSE CAST(2 * (3 * (CAST(g1 AS HUGEINT) * g1
           |                 + CAST(g2 AS HUGEINT) * g2 + CAST(g3 AS HUGEINT) * g3)
           |                 - CAST(sum_l AS HUGEINT) * sum_l) AS DOUBLE)
           |              / CAST(3 * CAST(sum_l AS HUGEINT) - sum_l2 AS DOUBLE) END > 5.99,
           |           false) AS rules_differ_flag
           |FROM m""".stripMargin)))
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hypothesis-test / distribution-comparison operators (§2.4 tail, added
  * r7): the statistical-audit verbs a large curation pipeline runs BESIDE
  * the transforms — is a quality signal actually predictive (ROC-AUC), did
  * two slices come from the same distribution (Kolmogorov–Smirnov), is a
  * mean shift significant (Welch's t), how bursty is arrival traffic
  * (Fano factor), how concentrated is the token mass (Gini). The
  * chi-square independence test lives in
  * [[SelectionQueries]] (`source_lang_chi2`); bootstrap CIs in
  * [[FunnelQueries]] (`bootstrap_mean_ci`).
  *
  * Float discipline (the [[Queries]] scaladoc contract): every statistic
  * here is exact-integer/decimal arithmetic up to ONE final
  * correctly-rounded double division (AUC, KS, Gini, Fano) or a FIXED
  * identical IEEE op chain (Welch's t — the volume_autocorr pattern), with
  * degenerate cases decided by exact integer CASEs, never NaN.
  *
  * Scale shape: each operator is one corpus pass into a grouped aggregate
  * whose cardinality is value-domain-bounded (distinct document lengths,
  * event types, sources) — the single-reducer cumulative windows run over
  * those bounded grids, never over corpus rows.
  */
object StatQueries {

  private val big = (c: Column) => c.cast("decimal(38,0)")

  /** kendall_tau_length_quality's τ-b denominator: sqrt(n0−tx)·sqrt(n0−ty)
    * over exact int64 tie statistics. The cross-engine argument (r11
    * verdict item 7) is NOT reassociation-safety — sqrt(a)·sqrt(b) and
    * sqrt(a·b) genuinely differ in the last ulp for some inputs — it is
    * that BOTH engines spell the SAME chain: int64→double cast, IEEE-754
    * sqrt, and double multiply are each required correctly rounded (sqrt
    * is a §5 basic operation, unlike ln/exp), so identical exact inputs
    * give identical bits on any conforming engine. R12BatchSpec sweeps
    * adversarial magnitudes (2^53±, near-overflow n0, perfect squares ±1)
    * against a driver-side Math.sqrt replay and exhibits a pair where the
    * reassociated sqrt(a·b) spelling WOULD diverge. */
  private[queries] def kendallDenom(n0: Column, tx: Column, ty: Column): Column =
    sqrt((n0 - tx).cast("double")) * sqrt((n0 - ty).cast("double"))

  /** best_split_length_dup's N/2-scaled weighted Gini on the micro grid,
    * over cumulative sufficient statistics (cp, cn, pp, nn). The numerator
    * products are widened to DECIMAL(38,0) BEFORE the ·10⁶ — cp·(cn−cp) is
    * ~N²/4 and wraps int64 once a split side holds ~3M positives (ADVICE
    * r10); the div result is ≤ N/4·10⁶, int64-safe to N ≈ 3.7e13 docs.
    * Shared with R12BatchSpec's synthetic 1e8-row sufficient-statistics
    * sweep so the spec exercises the production expression verbatim. */
  private[queries] def bestSplitScore6: Column =
    expr("(cast(cp as decimal(38,0)) * (cn - cp) * 1000000) div cn") +
      expr("(cast(pp - cp as decimal(38,0)) * ((nn - cn) - (pp - cp)) * 1000000) div (nn - cn)")

  val all: Map[String, Q] = Map(

    // ---- ROC-AUC of a quality signal vs duplicated-text membership -------
    // "Does document length predict corpus-duplicated text?" scored the
    // way eval pipelines score any ranking signal: AUC, computed exactly as
    // the Mann–Whitney U statistic with the standard average-rank tie
    // correction (ties are heavy here — integer char lengths — so the
    // midrank form is the only correct one). The positive label is
    // dup_ngram_ratio's signal — the doc shares at least one 5-gram with
    // another document (df ≥ 2). NOT the exact-text label: this corpus has
    // zero byte-identical texts at every SF, which would leave the
    // positive class empty and the AUC vacuously 0. Per distinct score
    // value v: cnt(v) docs, posg(v) of them positive. With cum(v) the
    // inclusive cumulative count in score order, every positive at v has
    // 2·midrank = 2·cum − cnt + 1, so
    //   S2 = Σ_v posg·(2·cum − cnt + 1) = 2·Σ_pos midrank, and
    //   AUC = (S2 − np(np+1)) / (2·np·nn)
    // — all integers until the one final division. Label and score both
    // derive from public corpus columns, so DuckDB reproduces them exactly.
    //
    // Scale shape: the label pass is dup_ngram_ratio's digest plan ((doc,
    // gram) counts, vocab-sized df join back — text never shuffles); the
    // rank grid is one agg keyed by n_chars — cardinality ≤ max document
    // length (an ingest contract, not corpus size), so the global
    // cumulative window runs over a tiny frame (PlanGuard R2 whitelist,
    // aggregated input). Docs with < 5 tokens have no 5-grams and label
    // negative via the left join.
    "auc_dup_quality" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tf = docs.withColumn("toks", split(col("text"), " "))
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
        val lab = tf
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"))
        val sc = docs.join(lab, Seq("doc_id"), "left")
          .select(col("n_chars").as("v"), coalesce(col("pos"), lit(0L)).as("pos"))
        val grid = sc.groupBy("v")
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("posg"))
        val win = Window.orderBy(col("v"))
        val r = grid.withColumn("cum", sum(col("cnt")).over(win))
        r.agg(
            sum(big(col("posg")) * (big(col("cum")) * 2 - big(col("cnt")) + 1)).as("s2"),
            sum(col("posg")).as("np"), sum(col("cnt")).as("n"))
          .select(col("np").as("n_pos"), (col("n") - col("np")).as("n_neg"),
            when(col("np") === 0 || col("n") === col("np"), lit(0.0))
              .otherwise(
                (col("s2") - big(col("np")) * (big(col("np")) + 1)).cast("double")
                  / (big(col("np")) * (big(col("n")) - big(col("np"))) * 2).cast("double"))
              .as("auc"))
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |occ AS (SELECT doc_id,
          |               UNNEST(list_transform(range(len(toks) - 4),
          |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
          |        FROM d WHERE len(toks) >= 5),
          |df AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh),
          |lab AS (SELECT occ.doc_id, MAX(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS pos
          |        FROM occ JOIN df USING (gh) GROUP BY occ.doc_id),
          |l AS (SELECT n_chars AS v, COALESCE(lab.pos, 0) AS pos
          |      FROM documents LEFT JOIN lab USING (doc_id)),
          |grid AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
          |                CAST(SUM(pos) AS BIGINT) AS posg
          |         FROM l GROUP BY v),
          |r AS (SELECT v, cnt, posg, SUM(cnt) OVER (ORDER BY v) AS cum FROM grid),
          |a AS (SELECT SUM(CAST(posg AS HUGEINT) * (CAST(cum AS HUGEINT) * 2 - cnt + 1)) AS s2,
          |             CAST(SUM(posg) AS BIGINT) AS np, CAST(SUM(cnt) AS BIGINT) AS n
          |      FROM r)
          |SELECT np AS n_pos, n - np AS n_neg,
          |       CASE WHEN np = 0 OR n = np THEN 0.0
          |            ELSE CAST(s2 - CAST(np AS HUGEINT) * (np + 1) AS DOUBLE)
          |                 / CAST(CAST(np AS HUGEINT) * (n - np) * 2 AS DOUBLE) END AS auc
          |FROM a""".stripMargin)),

    // ---- two-sample Kolmogorov–Smirnov on length distributions -----------
    // Distribution-shift detection between corpus slices: D = sup |F1 − F2|
    // between the n_chars ECDFs of the first ten sources vs the rest.
    // Exact form: with per-value cumulative counts f1, f2 and totals N1,
    // N2, D = max |f1·N2 − f2·N1| / (N1·N2) — the max runs over integers,
    // the division happens ONCE on the winning pair. The monitoring use:
    // re-crawls and new source mixes shift length profiles before they
    // shift anything semantic.
    //
    // Scale shape: one corpus pass into the (value, group) grid; the ECDF
    // window runs over the length grid (value-domain-bounded, PlanGuard R2
    // whitelist); the 1-row totals broadcast (R1 whitelist).
    "ks_source_lengths" -> Q(
      fn = (s, dir) => {
        val g = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("v"),
            when(expr("int(substring(source, 4, 8))") < 10, 1L).otherwise(0L).as("g1"))
        val grid = g.groupBy("v")
          .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
        val tot = grid.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val win = Window.orderBy(col("v"))
        val cum = grid.select(col("v"),
          sum(col("c1")).over(win).as("f1"), sum(col("c2")).over(win).as("f2"))
        cum.crossJoin(broadcast(tot))
          .agg(
            max(abs(big(col("f1")) * big(col("n2")) - big(col("f2")) * big(col("n1")))).as("dnum"),
            max(col("n1")).as("n1"), max(col("n2")).as("n2"))
          .select(col("n1"), col("n2"),
            when(col("n1") === 0 || col("n2") === 0, lit(0.0))
              .otherwise(col("dnum").cast("double")
                / (big(col("n1")) * big(col("n2"))).cast("double")).as("ks_d"))
      },
      oracle = Some(
        """WITH g AS (SELECT n_chars AS v,
          |             CASE WHEN CAST(substring(source, 4) AS INT) < 10
          |                  THEN 1 ELSE 0 END AS g1
          |           FROM documents),
          |grid AS (SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
          |                CAST(SUM(1 - g1) AS BIGINT) AS c2
          |         FROM g GROUP BY v),
          |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM grid),
          |cum AS (SELECT SUM(c1) OVER (ORDER BY v) AS f1,
          |               SUM(c2) OVER (ORDER BY v) AS f2
          |        FROM grid),
          |a AS (SELECT MAX(abs(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)) AS dnum,
          |             MAX(n1) AS n1, MAX(n2) AS n2
          |      FROM cum CROSS JOIN tot)
          |SELECT n1, n2,
          |       CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
          |            ELSE CAST(dnum AS DOUBLE)
          |                 / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS ks_d
          |FROM a""".stripMargin)),

    // ---- pairwise split balance: KS over doc lengths (added r8) ----------
    // train_split audits split SIZES; split_leakage audits near-dup
    // crossings; this closes the triad with DISTRIBUTIONAL balance — the
    // exact two-sample KS distance between the doc-length ECDFs of every
    // split pair. A hash split should be i.i.d., so ks_d ≈ 0 at scale; a
    // large train-vs-test D means the held-out band is not exchangeable
    // with train (lengths drifted — eval numbers won't transfer). Same
    // exact integer form as ks_source_lengths: D = max |f1·N2 − f2·N1| /
    // (N1·N2), everything int/HUGEINT until ONE bare division per pair.
    //
    // Scale shape: one corpus pass → (split, n_chars) agg; the cumulative
    // windows are PARTITIONED by pair and run over the value-domain-
    // bounded length grid (≤ |n_chars domain| rows per pair, never corpus
    // rows); the ≤3-row totals broadcast back.
    "split_ks" -> Q(
      fn = (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
          .select(col("n_chars").as("v"),
            when(col("h2") < "cc", "train")
              .when(col("h2") < "e6", "val").otherwise("test").as("split"))
        val cnt = d.groupBy("split", "v").agg(count(lit(1)).as("c"))
        val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
        val sides = pairs.map { case (a, b) =>
          cnt.filter(col("split").isin(a, b))
            .select(lit(s"${a}_vs_$b").as("pair"),
              when(col("split") === a, 1L).otherwise(2L).as("side"),
              col("v"), col("c"))
        }.reduce(_ unionByName _)
        val grid = sides.groupBy("pair", "v")
          .agg(sum(when(col("side") === 1L, col("c")).otherwise(0L)).as("c1"),
            sum(when(col("side") === 2L, col("c")).otherwise(0L)).as("c2"))
        val tot = grid.groupBy("pair").agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val win = Window.partitionBy("pair").orderBy("v")
        val cum = grid.select(col("pair"),
          sum(col("c1")).over(win).as("f1"), sum(col("c2")).over(win).as("f2"))
        cum.join(broadcast(tot), Seq("pair"))
          .groupBy("pair")
          .agg(
            max(abs(big(col("f1")) * big(col("n2")) - big(col("f2")) * big(col("n1"))))
              .as("dnum"),
            max(col("n1")).as("n1"), max(col("n2")).as("n2"))
          .select(col("pair"), col("n1"), col("n2"),
            when(col("n1") === 0 || col("n2") === 0, lit(0.0))
              .otherwise(col("dnum").cast("double")
                / (big(col("n1")) * big(col("n2"))).cast("double")).as("ks_d"))
          .orderBy("pair")
      },
      oracle = Some(
        """WITH d AS (SELECT n_chars AS v,
          |             CASE WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'cc'
          |                    THEN 'train'
          |                  WHEN substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'e6'
          |                    THEN 'val'
          |                  ELSE 'test' END AS split
          |           FROM documents),
          |cnt AS (SELECT split, v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY split, v),
          |sides AS (
          |  SELECT 'train_vs_val' AS pair, CASE WHEN split = 'train' THEN 1 ELSE 2 END AS side, v, c
          |  FROM cnt WHERE split IN ('train', 'val')
          |  UNION ALL
          |  SELECT 'train_vs_test', CASE WHEN split = 'train' THEN 1 ELSE 2 END, v, c
          |  FROM cnt WHERE split IN ('train', 'test')
          |  UNION ALL
          |  SELECT 'val_vs_test', CASE WHEN split = 'val' THEN 1 ELSE 2 END, v, c
          |  FROM cnt WHERE split IN ('val', 'test')),
          |grid AS (SELECT pair, v,
          |                CAST(SUM(CASE WHEN side = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
          |                CAST(SUM(CASE WHEN side = 2 THEN c ELSE 0 END) AS BIGINT) AS c2
          |         FROM sides GROUP BY pair, v),
          |tot AS (SELECT pair, CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
          |        FROM grid GROUP BY pair),
          |cum AS (SELECT pair,
          |               SUM(c1) OVER (PARTITION BY pair ORDER BY v) AS f1,
          |               SUM(c2) OVER (PARTITION BY pair ORDER BY v) AS f2
          |        FROM grid),
          |a AS (SELECT cum.pair,
          |             MAX(abs(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)) AS dnum,
          |             MAX(n1) AS n1, MAX(n2) AS n2
          |      FROM cum JOIN tot ON cum.pair = tot.pair
          |      GROUP BY cum.pair)
          |SELECT pair, n1, n2,
          |       CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
          |            ELSE CAST(dnum AS DOUBLE)
          |                 / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS ks_d
          |FROM a ORDER BY pair""".stripMargin)),

    // ---- Welch's t: weekend vs weekday event values per type -------------
    // The unequal-variance two-sample t statistic — the workhorse "is this
    // mean shift real" test — on event value, split weekend vs weekday
    // (Spark weekday() ≥ 5 ≡ DuckDB isodow ≥ 6, both ISO Monday-based).
    // Sufficient statistics are exact integer cents (the bootstrap_mean_ci
    // cast) with HUGEINT/DECIMAL(38,0) cross terms; the t itself is the
    // volume_autocorr discipline — one FIXED IEEE chain
    //   t = (s1/n1 − s2/n2) / sqrt(vn1/(n1²(n1−1)) + vn2/(n2²(n2−1)))
    // written identically on both engines, with degenerate groups (n < 2 or
    // both variances zero) decided by an exact integer CASE. Means are
    // reported in currency units as one bare division each.
    //
    // Scale shape: one corpus pass, partial+final agg on event_type; the
    // t arithmetic runs over ≤ |types| rows.
    "welch_ttest" -> Q(
      fn = (s, dir) => {
        val e = Tables.load(s, dir, "events").select(col("event_type"),
          when(weekday(to_date(col("ts"))) >= 5, 1L).otherwise(0L).as("we"),
          (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("c"))
        val m = e.groupBy("event_type").agg(
          sum(col("we")).as("n1"),
          sum(when(col("we") === 1, col("c")).otherwise(0L)).as("s1"),
          sum(when(col("we") === 1, big(col("c")) * big(col("c"))).otherwise(big(lit(0)))).as("ss1"),
          sum(lit(1L) - col("we")).as("n2"),
          sum(when(col("we") === 0, col("c")).otherwise(0L)).as("s2"),
          sum(when(col("we") === 0, big(col("c")) * big(col("c"))).otherwise(big(lit(0)))).as("ss2"))
        val vn1 = big(col("n1")) * col("ss1") - big(col("s1")) * big(col("s1"))
        val vn2 = big(col("n2")) * col("ss2") - big(col("s2")) * big(col("s2"))
        m.select(col("event_type"),
            col("n1").as("n_weekend"), col("n2").as("n_weekday"),
            when(col("n1") === 0, lit(null).cast("double"))
              .otherwise(col("s1").cast("double") / (col("n1") * 100L).cast("double"))
              .as("mean_weekend"),
            when(col("n2") === 0, lit(null).cast("double"))
              .otherwise(col("s2").cast("double") / (col("n2") * 100L).cast("double"))
              .as("mean_weekday"),
            when(col("n1") < 2 || col("n2") < 2 || (vn1 === 0 && vn2 === 0), lit(0.0))
              .otherwise(
                (col("s1").cast("double") / col("n1").cast("double")
                  - col("s2").cast("double") / col("n2").cast("double"))
                  / sqrt(
                    vn1.cast("double")
                      / (big(col("n1")) * big(col("n1")) * (big(col("n1")) - 1)).cast("double")
                      + vn2.cast("double")
                      / (big(col("n2")) * big(col("n2")) * (big(col("n2")) - 1)).cast("double")))
              .as("t_welch"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH e AS (SELECT event_type,
          |             CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS we,
          |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
          |           FROM events),
          |m AS (SELECT event_type,
          |        CAST(SUM(we) AS BIGINT) AS n1,
          |        CAST(SUM(CASE WHEN we = 1 THEN c ELSE 0 END) AS BIGINT) AS s1,
          |        SUM(CASE WHEN we = 1 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss1,
          |        CAST(SUM(1 - we) AS BIGINT) AS n2,
          |        CAST(SUM(CASE WHEN we = 0 THEN c ELSE 0 END) AS BIGINT) AS s2,
          |        SUM(CASE WHEN we = 0 THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ss2
          |      FROM e GROUP BY event_type),
          |m2 AS (SELECT *,
          |         CAST(n1 AS HUGEINT) * ss1 - CAST(s1 AS HUGEINT) * s1 AS vn1,
          |         CAST(n2 AS HUGEINT) * ss2 - CAST(s2 AS HUGEINT) * s2 AS vn2
          |       FROM m)
          |SELECT event_type, n1 AS n_weekend, n2 AS n_weekday,
          |       CASE WHEN n1 = 0 THEN NULL
          |            ELSE CAST(s1 AS DOUBLE) / CAST(n1 * 100 AS DOUBLE) END AS mean_weekend,
          |       CASE WHEN n2 = 0 THEN NULL
          |            ELSE CAST(s2 AS DOUBLE) / CAST(n2 * 100 AS DOUBLE) END AS mean_weekday,
          |       CASE WHEN n1 < 2 OR n2 < 2 OR (vn1 = 0 AND vn2 = 0) THEN 0.0
          |            ELSE (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |                  - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          |                 / sqrt(CAST(vn1 AS DOUBLE)
          |                        / CAST(CAST(n1 AS HUGEINT) * n1 * (n1 - 1) AS DOUBLE)
          |                        + CAST(vn2 AS DOUBLE)
          |                        / CAST(CAST(n2 AS HUGEINT) * n2 * (n2 - 1) AS DOUBLE)) END AS t_welch
          |FROM m2 ORDER BY event_type""".stripMargin)),

    // ---- Fano factor: arrival burstiness per event type ------------------
    // Dispersion of daily arrival counts: F = s²/mean (variance-to-mean
    // ratio of the daily series). F ≈ 1 is Poisson-like traffic, F ≫ 1
    // bursty/overdispersed — the number capacity planning for the priority
    // buckets reads next to volume_autocorr's trend signal. Exact ints:
    //   F = (n·Σc² − (Σc)²) / ((n−1)·Σc)
    // (sample variance over mean, both ×n(n−1) — cancels to one division).
    //
    // Scale shape: (type, day) agg with map-side combine, then a ≤ |types|
    // roll-up — volume_autocorr's exact plan.
    "fano_burstiness" -> Q(
      fn = (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sa"),
            sum(big(col("c")) * big(col("c"))).as("saa"))
          .select(col("event_type"), col("n").as("n_days"),
            (col("sa").cast("double") / col("n").cast("double")).as("mean_daily"),
            when(col("n") < 2, lit(0.0))
              .otherwise(
                (big(col("n")) * col("saa") - big(col("sa")) * big(col("sa"))).cast("double")
                  / ((big(col("n")) - 1) * big(col("sa"))).cast("double")).as("fano"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          |                 CAST(COUNT(*) AS BIGINT) AS c
          |               FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |             CAST(SUM(c) AS BIGINT) AS sa,
          |             SUM(CAST(c AS HUGEINT) * c) AS saa
          |      FROM daily GROUP BY event_type)
          |SELECT event_type, n AS n_days,
          |       CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS mean_daily,
          |       CASE WHEN n < 2 THEN 0.0
          |            ELSE CAST(CAST(n AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa AS DOUBLE)
          |                 / CAST((CAST(n AS HUGEINT) - 1) * sa AS DOUBLE) END AS fano
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- Gini coefficient of token mass across sources -------------------
    // How concentrated is the training-mix token budget? The Lorenz-curve
    // Gini over per-source token counts, in the exact rank form
    //   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx),  xᵢ ascending
    // — integers until the one division (ties ordered by source for
    // determinism; Σ i·xᵢ is tie-order-invariant since equal x swap
    // freely). G → 0 is a uniform mix, G → 1 one source dominating — the
    // one-number companion to mix_weights' full table.
    //
    // Scale shape: one corpus token pass into the |sources| aggregate; the
    // rank window runs over that ≤ |sources|-row frame (PlanGuard R2
    // whitelist, aggregated input).
    "gini_source_tokens" -> Q(
      fn = (s, dir) => {
        val tok = Tables.load(s, dir, "documents").groupBy("source")
          .agg(sum(size(split(col("text"), " "))).as("x"))
        val win = Window.orderBy(col("x"), col("source"))
        tok.withColumn("i", row_number().over(win))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(big(col("i")) * big(col("x"))).as("six"))
          .select(col("n").as("n_sources"), col("sx").as("total_tokens"),
            when(col("sx") === 0, lit(0.0))
              .otherwise(
                (col("six") * 2 - (big(col("n")) + 1) * big(col("sx"))).cast("double")
                  / (big(col("n")) * big(col("sx"))).cast("double")).as("gini"))
      },
      oracle = Some(
        """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS x
          |             FROM documents GROUP BY source),
          |r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, source) AS i FROM tok),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
          |             SUM(CAST(i AS HUGEINT) * x) AS six
          |      FROM r)
          |SELECT n AS n_sources, sx AS total_tokens,
          |       CASE WHEN sx = 0 THEN 0.0
          |            ELSE CAST(six * 2 - (CAST(n AS HUGEINT) + 1) * sx AS DOUBLE)
          |                 / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) END AS gini
          |FROM a""".stripMargin)),

    // ---- earth-mover's distance: source length dists vs corpus (r8) ------
    // The INTEGRAL companion of ks_source_lengths' sup metric: 1-D
    // Wasserstein-1 distance between each source's doc-length ECDF and the
    // corpus ECDF, W₁ = ∫|F_a − F|dx = Σ_grid |F_a(v) − F(v)|·(v⁺ − v).
    // KS sees only the single worst vertical gap; EMD integrates the whole
    // mismatch in CHARACTER units ("this source's docs are on average ~W₁
    // chars of CDF-mass away from the corpus profile") — the mix-design
    // number to watch when rebalancing sources shifts the length profile
    // the packer was tuned for. ENGINE-VERSION-PROOF: with f_a, cf the
    // integer cumulative counts and n_a, N the totals,
    //   W₁ = Σ |f_a·N − cf·n_a|·gap / (n_a·N)
    // — exact DECIMAL(38,0)/HUGEINT cross-products summed (magnitude ≤
    // 6e4²·577·523 ≈ 1e15 < 2⁵³, so even the final cast is exact), ONE
    // bare division per source.
    //
    // Scale shape: one corpus pass → per-value grid + (source, v) agg; the
    // merged-grid expansion is |sources| × |length domain| (≤ 20×523 — an
    // ingest contract, never corpus rows) built from a whitelisted
    // broadcast cross join; per-source CDF windows PARTITION by source;
    // the corpus-CDF window is global but runs over the aggregated length
    // grid (R2 whitelist, measured bound = nChars).
    "emd_source_lengths" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("v"))
        val grid = docs.groupBy("v").agg(count(lit(1)).as("ct"))
        val wv = Window.orderBy(col("v"))
        val corp = grid.select(col("v"),
          sum(col("ct")).over(wv).as("cf"),
          (lead(col("v"), 1).over(wv) - col("v")).as("gap"))
        val tot = docs.groupBy("source").agg(count(lit(1)).as("na"))
        val nn = docs.agg(count(lit(1)).as("nn"))
        val sv = docs.groupBy("source", "v").agg(count(lit(1)).as("c"))
        val ws = Window.partitionBy(col("source")).orderBy(col("v"))
        tot.crossJoin(broadcast(corp))
          .join(sv, Seq("source", "v"), "left")
          .na.fill(0L, Seq("c"))
          .withColumn("fa", sum(col("c")).over(ws))
          .filter(col("gap").isNotNull)
          .crossJoin(broadcast(nn))
          .groupBy(col("source"), col("na"), col("nn"))
          .agg(sum(abs(big(col("fa")) * big(col("nn")) - big(col("cf")) * big(col("na")))
            * big(col("gap"))).as("dnum"))
          .select(col("source"), col("na").as("n_docs"),
            (col("dnum").cast("double")
              / (big(col("na")) * big(col("nn"))).cast("double")).as("emd_chars"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH docs AS (SELECT source, n_chars AS v FROM documents),
          |grid AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ct FROM docs GROUP BY v),
          |corp AS (SELECT v, SUM(ct) OVER (ORDER BY v) AS cf,
          |                LEAD(v) OVER (ORDER BY v) - v AS gap FROM grid),
          |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS na FROM docs GROUP BY source),
          |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM docs),
          |sv AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c FROM docs GROUP BY source, v),
          |cum AS (SELECT t.source, t.na, g.cf, g.gap,
          |               SUM(COALESCE(s.c, 0)) OVER (PARTITION BY t.source ORDER BY g.v) AS fa
          |        FROM tot t CROSS JOIN corp g
          |        LEFT JOIN sv s ON s.source = t.source AND s.v = g.v)
          |SELECT source, na AS n_docs,
          |       CAST(SUM(abs(CAST(fa AS HUGEINT) * nt.nn - CAST(cf AS HUGEINT) * na)
          |                * gap) AS DOUBLE)
          |       / CAST(CAST(na AS HUGEINT) * nt.nn AS DOUBLE) AS emd_chars
          |FROM cum, nt WHERE gap IS NOT NULL
          |GROUP BY source, na, nt.nn
          |ORDER BY source""".stripMargin)),

    // ---- Hill tail-index of the document-length distribution (r8) --------
    // How heavy is the long-document tail? The Hill estimator over the
    // top-k order statistics, α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) — the standard
    // "is this power-law and how fat" number (α ≤ 2: infinite variance —
    // length-based batch packing will be dominated by stragglers; the
    // planning complement of zipf_fit's token-frequency exponent and
    // length_quantiles' fixed percentiles). TIE-ROBUST by construction:
    // rows equal to the threshold contribute ln6(x, x) = 0, so summing
    // over all 101 top rows equals the textbook sum over the strict top-k
    // regardless of how the engine breaks ties at the cut. ENGINE-VERSION-
    // PROOF: ln via the LnGrid integer chain, α ONE bare division of
    // exact ints.
    //
    // Scale shape: TakeOrderedAndProject(101) — top-k never sorts the
    // corpus — then a 101-row ln chain + 1-row agg; the threshold is a
    // 1-row broadcast.
    "hill_tail_index" -> Q(
      fn = (s, dir) => {
        val top = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("x")).orderBy(col("x").desc).limit(101)
        val thr = top.agg(min(col("x")).as("xk"))
        val l = LnGrid.withLn6(top.crossJoin(broadcast(thr)),
          col("x"), col("xk"), "l6")
        l.agg(sum(col("l6")).as("sum_ln6"), max(col("xk")).as("x_threshold"),
            count(lit(1)).as("m"))
          .select((col("m") - 1).as("k"), col("x_threshold"), col("sum_ln6"),
            when(col("sum_ln6") === 0, lit(null).cast("double"))
              .otherwise(((col("m") - 1) * lit(1000000L)).cast("double")
                / col("sum_ln6").cast("double")).as("hill_alpha"))
      },
      oracle = Some(
        s"""WITH topx AS (SELECT n_chars AS x FROM documents ORDER BY x DESC LIMIT 101),
           |thr AS (SELECT MIN(x) AS xk FROM topx),
           |j AS (SELECT x, xk FROM topx, thr),
           |${LnGrid.sqlCtes("j", "x", "xk", "l6", "hl_")},
           |a AS (SELECT CAST(SUM(l6) AS BIGINT) AS sum_ln6, MAX(xk) AS x_threshold,
           |             CAST(COUNT(*) AS BIGINT) AS m FROM hl_out)
           |SELECT m - 1 AS k, x_threshold, sum_ln6,
           |       CASE WHEN sum_ln6 = 0 THEN NULL
           |            ELSE CAST((m - 1) * 1000000 AS DOUBLE) / CAST(sum_ln6 AS DOUBLE)
           |       END AS hill_alpha
           |FROM a""".stripMargin)),

    // ---- Simpson diversity / effective vocabulary per source (r8) --------
    // The collision-probability view of lexical diversity: Simpson's
    // D = Σc(c−1)/(n(n−1)) is the chance two tokens drawn without
    // replacement are the same type; 1/D is the "effective vocabulary" —
    // how many EQUALLY-common types would produce this concentration.
    // Complements token_entropy (Shannon view, ln-grid) and
    // gini_source_tokens (rank view) with the moment that needs NO
    // transcendental at all: both emitted ratios are bare divisions of
    // exact int64 sufficient statistics (c·(c−1) ≤ 1e14 at gate counts;
    // widen to DECIMAL(38,0) at 100 TB per the token_burstiness
    // discipline). Degenerate n ≤ 1 or all-singleton sources emit NULL by
    // exact integer CASE.
    //
    // Scale shape: one (source, tok) agg → ≤|sources| roll-up.
    "simpson_diversity" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
            sum(col("c") * (col("c") - 1)).as("s2"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            when(col("n_tokens") <= 1, lit(null).cast("double"))
              .otherwise(col("s2").cast("double")
                / (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))
              .as("simpson"),
            when(col("s2") === 0, lit(null).cast("double"))
              .otherwise((col("n_tokens") * (col("n_tokens") - 1)).cast("double")
                / col("s2").cast("double")).as("eff_vocab"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS tok
          |            FROM documents),
          |c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
          |      FROM st GROUP BY source, tok),
          |a AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |             CAST(COUNT(*) AS BIGINT) AS vocab,
          |             CAST(SUM(c * (c - 1)) AS BIGINT) AS s2
          |      FROM c GROUP BY source)
          |SELECT source, n_tokens, vocab,
          |       CASE WHEN n_tokens <= 1 THEN NULL
          |            ELSE CAST(s2 AS DOUBLE)
          |                 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) END AS simpson,
          |       CASE WHEN s2 = 0 THEN NULL
          |            ELSE CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
          |                 / CAST(s2 AS DOUBLE) END AS eff_vocab
          |FROM a ORDER BY source""".stripMargin)),

    // ---- OLS of quality on document length (added r8) --------------------
    // Is the quality signal just length in disguise? The regression-audit
    // answer: OLS of the quality score (10⁻⁶ grid integer q6) on n_chars,
    // slope/intercept/R² — a high R² says the "quality" filter is really a
    // length filter and the curation review should treat it as one
    // (complements auc_dup_quality's rank-based view with the linear
    // effect size). ENGINE-VERSION-PROOF: the five sufficient statistics
    // (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64 sums; every emitted
    // coefficient is ONE bare division of DECIMAL(38,0) cross-products
    //   slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    //   intercept = (ΣyΣx² − ΣxΣxy)/(nΣx² − (Σx)²)
    //   R² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    // — degenerate variance zero → NULL by exact CASE.
    //
    // Scale shape: one map-side projection → a 1-row aggregate.
    "ols_length_quality" -> Q(
      fn = (s, dir) => {
        val q6 = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .select(col("n_chars").as("x"),
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long").as("y"))
        val a = q6.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
        val vx = big(col("n")) * big(col("sxx")) - big(col("sx")) * big(col("sx"))
        val vy = big(col("n")) * big(col("syy")) - big(col("sy")) * big(col("sy"))
        val cxy = big(col("n")) * big(col("sxy")) - big(col("sx")) * big(col("sy"))
        a.select(col("n"),
          when(vx === 0, lit(null).cast("double"))
            .otherwise(cxy.cast("double") / vx.cast("double")).as("slope"),
          when(vx === 0, lit(null).cast("double"))
            .otherwise((big(col("sy")) * big(col("sxx"))
              - big(col("sx")) * big(col("sxy"))).cast("double") / vx.cast("double"))
            .as("intercept"),
          when(vx === 0 || vy === 0, lit(null).cast("double"))
            .otherwise((cxy * cxy).cast("double") / (vx * vy).cast("double")).as("r2"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT n_chars AS x, string_split(text, ' ') AS toks,
           |                  length(text) AS nc FROM documents),
           |q AS (SELECT x,
           |             CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                  + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                        w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                        AS DOUBLE) / len(toks))
           |                  + 0.3 * least(1.0, CAST(nc AS DOUBLE) / 200.0))
           |                  * 1000000.0) AS BIGINT) AS y
           |      FROM t),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
           |             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
           |             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
           |      FROM q),
           |c AS (SELECT n,
           |             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
           |             CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy,
           |             CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cxy,
           |             CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS inum
           |      FROM a)
           |SELECT n,
           |       CASE WHEN vx = 0 THEN NULL
           |            ELSE CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE) END AS slope,
           |       CASE WHEN vx = 0 THEN NULL
           |            ELSE CAST(inum AS DOUBLE) / CAST(vx AS DOUBLE) END AS intercept,
           |       CASE WHEN vx = 0 OR vy = 0 THEN NULL
           |            ELSE CAST(cxy * cxy AS DOUBLE) / CAST(vx * vy AS DOUBLE) END AS r2
           |FROM c""".stripMargin)),

    // ---- one-way ANOVA: document length by source (added r8) -------------
    // The k-group generalization of welch_ttest's two-sample question: do
    // the 20 sources draw doc lengths from a common mean (F ≈ 1) or is
    // between-source variation real (F ≫ 1 — stratify anything
    // length-sensitive by source)? Sufficient statistics per group are
    // exact int64 (n_g, T_g = Σx, S_g = Σx²). The between-group term
    // Q = Σ T_g²/n_g mixes 20 divisions, and a SUM over groups would be
    // summation-order-dependent — so Q is computed as a FOLD over the
    // per-group terms in sorted-source order (collect sorted structs →
    // aggregate() left-to-right; DuckDB list(… ORDER BY source) →
    // list_reduce) — the volume_autocorr fixed-op-chain discipline: same
    // terms, same order, same IEEE ops ⇒ identical bits. F is the final
    // fixed chain ((Q − T²/n)/(k−1)) / ((S − Q)/(n−k)).
    //
    // Scale shape: one ≤|sources| sufficient-stats agg → a 1-row fold;
    // nothing corpus-sized past the first agg.
    "anova_length_by_source" -> Q(
      fn = (s, dir) => {
        val g = Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("ng"), sum(col("n_chars")).as("tg"),
            sum(col("n_chars") * col("n_chars")).as("sg"))
        g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
            sum(col("tg")).as("t"), sum(col("sg")).as("ss"),
            sort_array(collect_list(struct(col("source"), col("tg"), col("ng"))))
              .as("terms"))
          .withColumn("q", expr(
            "aggregate(terms, cast(0.0 as double), (acc, x) -> acc + (cast(x.tg as double) * cast(x.tg as double)) / cast(x.ng as double))"))
          .select(col("k"), col("n"),
            (col("q") - (col("t").cast("double") * col("t").cast("double"))
              / col("n").cast("double")).as("ssb"),
            (col("ss").cast("double") - col("q")).as("ssw"))
          .select(col("k"), col("n"), col("ssb"), col("ssw"),
            when(col("k") <= 1 || col("n") <= col("k"), lit(null).cast("double"))
              .otherwise((col("ssb") / (col("k") - 1).cast("double"))
                / (col("ssw") / (col("n") - col("k")).cast("double"))).as("f_stat"))
      },
      oracle = Some(
        """WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ng,
          |                  CAST(SUM(n_chars) AS BIGINT) AS tg,
          |                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS sg
          |           FROM documents GROUP BY source),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
          |             CAST(SUM(tg) AS BIGINT) AS t, CAST(SUM(sg) AS BIGINT) AS ss,
          |             list_reduce(
          |               list_prepend(CAST(0.0 AS DOUBLE),
          |                 list(CAST(tg AS DOUBLE) * CAST(tg AS DOUBLE) / ng
          |                      ORDER BY source)),
          |               (acc, x) -> acc + x) AS q
          |      FROM g)
          |SELECT k, n,
          |       q - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
          |       CAST(ss AS DOUBLE) - q AS ssw,
          |       CASE WHEN k <= 1 OR n <= k THEN NULL
          |            ELSE ((q - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
          |                  / CAST(k - 1 AS DOUBLE))
          |                 / ((CAST(ss AS DOUBLE) - q) / CAST(n - k AS DOUBLE))
          |       END AS f_stat
          |FROM a""".stripMargin)),

    // ---- Spearman rank correlation: length vs quality (added r8) ---------
    // The rank companion of ols_length_quality's Pearson view: monotone
    // association robust to the score's nonlinear clamps (the quality
    // formula saturates at 50 tokens / 200 chars — Pearson under-reads
    // the relationship past the clamp, Spearman doesn't care). Spearman
    // with ties = Pearson on MIDRANKS, and both midrank tables are exact
    // integers from value-grid cumulative counts (2·midrank = 2·cum −
    // cnt + 1): the n_chars grid uses the auc-style value-domain window;
    // the fine-grained q6 grid is BANDED (q6 div 10⁵ partitions + a tiny
    // offsets frame — the quality_rank_parity stitching applied to
    // cumulative counts) so no global window ever sees a corpus-sized
    // frame. C, Vx, Vy are exact DECIMAL cross-products; the emitted
    // statistic is the SIGNED rho² = C·|C|/(Vx·Vy) — ONE bare division
    // (rho itself would need a √ of a ratio; the signed square carries
    // the same ordering information on an exact grid).
    "spearman_length_quality" -> Q(
      fn = (s, dir) => {
        // r16: the per-doc (x, y) projection — a tokenize + stopword filter
        // over every row — fed FIVE plan branches (xg, ygrid→yoff, ygrid→yg,
        // and the m join's own base + grid re-derivations) and re-executed
        // per branch (ReuseCheck: 8 parquet scans, 0 reused exchanges).
        // Materialize the three-column frame ONCE; every grid then reads
        // the checkpoint — one corpus pass at any scale.
        val base = Q.truncate(Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .select(col("doc_id"), col("n_chars").as("x"),
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long").as("y")))
        val xg = base.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("x"))))
          .select(col("x"), (col("cum") * 2 - col("cnt") + 1).as("mx2"))
        val ygrid = base.groupBy(col("y")).agg(count(lit(1)).as("cnt"))
          .withColumn("band", expr("y div 100000"))
        val yoff = ygrid.groupBy("band").agg(sum(col("cnt")).as("bc"))
          .withColumn("off", coalesce(sum(col("bc")).over(
            Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select(col("band"), col("off"))
        val yg = ygrid
          .withColumn("icum", sum(col("cnt")).over(
            Window.partitionBy("band").orderBy(col("y"))))
          .join(broadcast(yoff), Seq("band"))
          .select(col("y"), ((col("off") + col("icum")) * 2 - col("cnt") + 1).as("my2"))
        val m = base.join(broadcast(xg), Seq("x")).join(yg, Seq("y"))
        m.agg(count(lit(1)).as("n"),
            sum(col("mx2")).as("sx"), sum(col("my2")).as("sy"),
            sum(big(col("mx2")) * big(col("my2"))).as("sxy"),
            sum(big(col("mx2")) * big(col("mx2"))).as("sxx"),
            sum(big(col("my2")) * big(col("my2"))).as("syy"))
          .select(col("n"),
            when((big(col("n")) * col("sxx") - big(col("sx")) * big(col("sx"))) === 0
              || (big(col("n")) * col("syy") - big(col("sy")) * big(col("sy"))) === 0,
              lit(null).cast("double"))
              .otherwise {
                val c = big(col("n")) * col("sxy") - big(col("sx")) * big(col("sy"))
                val vx = big(col("n")) * col("sxx") - big(col("sx")) * big(col("sx"))
                val vy = big(col("n")) * col("syy") - big(col("sy")) * big(col("sy"))
                (c * abs(c)).cast("double") / (vx * vy).cast("double")
              }.as("rho2_signed"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, n_chars AS x, string_split(text, ' ') AS toks,
           |                  length(text) AS nc FROM documents),
           |b AS (SELECT doc_id, x,
           |             CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                  + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                        w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                        AS DOUBLE) / len(toks))
           |                  + 0.3 * least(1.0, CAST(nc AS DOUBLE) / 200.0))
           |                  * 1000000.0) AS BIGINT) AS y
           |      FROM t),
           |xg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY x),
           |xm AS (SELECT x, (SUM(cnt) OVER (ORDER BY x)) * 2 - cnt + 1 AS mx2 FROM xg),
           |yg AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY y),
           |ym AS (SELECT y, (SUM(cnt) OVER (ORDER BY y)) * 2 - cnt + 1 AS my2 FROM yg),
           |m AS (SELECT b.doc_id, xm.mx2, ym.my2
           |      FROM b JOIN xm USING (x) JOIN ym USING (y)),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(mx2) AS BIGINT) AS sx, CAST(SUM(my2) AS BIGINT) AS sy,
           |             SUM(CAST(mx2 AS HUGEINT) * my2) AS sxy,
           |             SUM(CAST(mx2 AS HUGEINT) * mx2) AS sxx,
           |             SUM(CAST(my2 AS HUGEINT) * my2) AS syy
           |      FROM m)
           |SELECT n,
           |       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
           |              OR CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy = 0
           |            THEN NULL
           |            ELSE CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
           |                      * abs(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
           |                      AS DOUBLE)
           |                 / CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
           |                        * (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
           |                        AS DOUBLE)
           |       END AS rho2_signed
           |FROM a""".stripMargin)),
    // The rank-based robust twin of anova_length_by_source — outlier doc
    // lengths can't drag the verdict because only RANKS enter:
    //   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    // with midranks for ties (integer lengths tie heavily, so the midrank
    // form is the only correct one — auc_dup_quality's machinery). EXACT
    // rank sums from the value grid: per (value, group), every doc at v
    // has 2·midrank = 2·cum − cnt + 1, so 2R_g = Σ_v c_gv·(2·cum − cnt +
    // 1) is an exact int64; the per-group division mix Σ (2R_g)²/n_g is
    // an ordered FOLD in sorted-source order (the ANOVA discipline) and
    // H is the final fixed IEEE chain with the /4 folded into the 12/4 =
    // 3 constant. No tie correction (documented — both engines identical
    // regardless).
    //
    // Scale shape: one (value, source) grid agg; the cumulative window
    // runs over the value-domain grid (R2 whitelist, ks_source_lengths
    // shape); ≤|sources| rank-sum agg → 1-row fold.
    // ---- Theil inequality decomposition of token mass (added r8) ---------
    // WHY Theil instead of another Gini: it decomposes EXACTLY —
    // T_total = T_between + Σ_s share_s·T_within_s — so "is token mass
    // unequal because sources differ in size, or because docs differ
    // within sources?" gets a quantitative answer (the mix-design vs
    // doc-curation attribution). All three tiers fold to LnGrid forms:
    //   T_total  = Σ_d x_d·ln6(x_d·n, S) / (S·10⁶)
    //   T_between = Σ_s S_s·ln6(S_s·n, n_s·S) / (S·10⁶)
    //   T_within_s = Σ_{d∈s} x_d·ln6(x_d·n_s, S_s) / (S_s·10⁶)
    // — exact int64 weighted sums, ONE bare division per emitted row; the
    // decomposition identity holds to grid precision (spec-checked with
    // that tolerance). Operand bound x·n < 9.2e9 holds to ~10⁸ docs;
    // beyond that use the wide chain (documented).
    //
    // Scale shape: one per-doc token-count pass → doc-keyed ln chains →
    // per-source + 1-row aggs; the between tier is ≤|sources| rows.
    "theil_decomposition" -> Q(
      fn = (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("x"))
        val src = d.groupBy("source").agg(count(lit(1)).as("ns"), sum(col("x")).as("ss"))
        val tot = src.agg(sum(col("ns")).as("n"), sum(col("ss")).as("st"))
        val dj = d.join(broadcast(src), Seq("source")).crossJoin(broadcast(tot))
        val dT = LnGrid.withLn6(dj, col("x") * col("n"), col("st"), "lt6", "__tt_")
        val dW = LnGrid.withLn6(dT, col("x") * col("ns"), col("ss"), "lw6", "__tw_")
        val within = dW.groupBy(col("source"), col("ss"), col("st"))
          .agg(sum(col("x") * col("lw6")).as("wsum"))
          .select(col("source").as("component"),
            (col("wsum").cast("double")
              / (col("ss") * lit(1000000L)).cast("double")).as("t_nats"),
            (col("ss").cast("double") / col("st").cast("double")).as("share"))
        val total = dW.groupBy(col("st"))
          .agg(sum(col("x") * col("lt6")).as("tsum"))
          .select(lit("__total").as("component"),
            (col("tsum").cast("double")
              / (col("st") * lit(1000000L)).cast("double")).as("t_nats"),
            lit(1.0).as("share"))
        val bj = src.crossJoin(broadcast(tot))
        val between = LnGrid.withLn6(bj, col("ss") * col("n"), col("ns") * col("st"),
            "lb6", "__tb_")
          .groupBy(col("st"))
          .agg(sum(col("ss") * col("lb6")).as("bsum"))
          .select(lit("__between").as("component"),
            (col("bsum").cast("double")
              / (col("st") * lit(1000000L)).cast("double")).as("t_nats"),
            lit(1.0).as("share"))
        within.unionByName(total).unionByName(between).orderBy("component")
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, source,
           |             CAST(len(string_split(text, ' ')) AS BIGINT) AS x
           |           FROM documents),
           |src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns,
           |               CAST(SUM(x) AS BIGINT) AS ss
           |        FROM d GROUP BY source),
           |tt AS (SELECT CAST(SUM(ns) AS BIGINT) AS n, CAST(SUM(ss) AS BIGINT) AS st
           |       FROM src),
           |dj AS (SELECT d.doc_id, d.source, d.x, src.ns, src.ss, tt.n, tt.st
           |       FROM d JOIN src USING (source), tt),
           |${LnGrid.sqlCtes("dj", "x * n", "st", "lt6", "tt_")},
           |${LnGrid.sqlCtes("tt_out", "x * ns", "ss", "lw6", "tw_")},
           |w AS (SELECT source AS component,
           |             CAST(SUM(x * lw6) AS DOUBLE) / CAST(ss * 1000000 AS DOUBLE) AS t_nats,
           |             CAST(ss AS DOUBLE) / CAST(st AS DOUBLE) AS share
           |      FROM tw_out GROUP BY source, ss, st),
           |tl AS (SELECT '__total' AS component,
           |              CAST(SUM(x * lt6) AS DOUBLE) / CAST(st * 1000000 AS DOUBLE) AS t_nats,
           |              1.0 AS share
           |       FROM tw_out GROUP BY st),
           |bj AS (SELECT src.source, src.ns, src.ss, tt.n, tt.st FROM src, tt),
           |${LnGrid.sqlCtes("bj", "ss * n", "ns * st", "lb6", "tb_")},
           |btw AS (SELECT '__between' AS component,
           |               CAST(SUM(ss * lb6) AS DOUBLE) / CAST(st * 1000000 AS DOUBLE) AS t_nats,
           |               1.0 AS share
           |        FROM tb_out GROUP BY st)
           |SELECT * FROM (SELECT * FROM w UNION ALL SELECT * FROM tl
           |               UNION ALL SELECT * FROM btw)
           |ORDER BY component""".stripMargin)),

    "kruskal_length_by_source" -> Q(
      fn = (s, dir) => {
        val grid = Tables.load(s, dir, "documents")
          .groupBy(col("n_chars").as("v"), col("source"))
          .agg(count(lit(1)).as("cgv"))
        val vGrid = grid.groupBy("v").agg(sum(col("cgv")).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
        val r2 = grid.join(broadcast(vGrid), Seq("v"))
          .groupBy("source")
          .agg(sum(col("cgv")).as("ng"),
            sum(col("cgv") * (col("cum") * 2 - col("cnt") + 1)).as("r2g"))
        r2.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
            sort_array(collect_list(struct(col("source"), col("r2g"), col("ng"))))
              .as("terms"))
          .withColumn("q", expr(
            "aggregate(terms, cast(0.0 as double), (acc, x) -> acc + (cast(x.r2g as double) * cast(x.r2g as double)) / cast(x.ng as double))"))
          .select(col("k"), col("n"),
            when(col("n") <= 1, lit(null).cast("double"))
              .otherwise(lit(3.0) * col("q")
                / (col("n").cast("double") * (col("n") + 1).cast("double"))
                - lit(3.0) * (col("n") + 1).cast("double")).as("h_stat"))
      },
      oracle = Some(
        """WITH grid AS (SELECT n_chars AS v, source, CAST(COUNT(*) AS BIGINT) AS cgv
          |              FROM documents GROUP BY n_chars, source),
          |vg AS (SELECT v, CAST(SUM(cgv) AS BIGINT) AS cnt FROM grid GROUP BY v),
          |vc AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM vg),
          |r2 AS (SELECT g.source, CAST(SUM(g.cgv) AS BIGINT) AS ng,
          |              CAST(SUM(g.cgv * (vc.cum * 2 - vc.cnt + 1)) AS BIGINT) AS r2g
          |       FROM grid g JOIN vc USING (v) GROUP BY g.source),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
          |             list_reduce(
          |               list_prepend(CAST(0.0 AS DOUBLE),
          |                 list(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) / ng
          |                      ORDER BY source)),
          |               (acc, x) -> acc + x) AS q
          |      FROM r2)
          |SELECT k, n,
          |       CASE WHEN n <= 1 THEN NULL
          |            ELSE 3.0 * q / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
          |                 - 3.0 * CAST(n + 1 AS DOUBLE)
          |       END AS h_stat
          |FROM a""".stripMargin)),

    // ---- Gini concentration of user lifetime revenue (added r8) ----------
    // The single-number whale statistic behind user_ltv_quantiles' curve:
    // Gini over per-user lifetime purchase revenue (0 = every payer equal,
    // →1 = a handful of whales carry the business). Same exact rank form
    // as gini_source_tokens — G = (2Σᵢ i·xᵢ − (n+1)Σx)/(n·Σx) — but users
    // are CORPUS-scale, so the global sort is STITCHED (the
    // quality_buckets discipline): shard by the revenue-bucket g =
    // cents div 10⁵ (value-domain bounded), rank within shard by (cents,
    // user_id), add shard offsets from the tiny per-shard count frame —
    // a bijection identical to the full sort's ROW_NUMBER because g is
    // monotone in cents (the oracle uses the plain global ROW_NUMBER and
    // must hash-match, which PROVES the stitching). All sums exact
    // int64/DECIMAL; G is ONE bare division.
    //
    // Scale shape: user-keyed revenue agg → per-shard rank windows (never
    // one reducer over all users) + a ≤|buckets| offsets frame → 1-row
    // roll-up.
    // ---- Population Stability Index, A/A-wired (added r8) ----------------
    // The MLOps-standard drift score (banking scorecard lineage): PSI =
    // Σ_bins (p_b − q_b)·ln(p_b/q_b), conventionally read as < 0.1 stable
    // / 0.1–0.25 drifting / > 0.25 shifted. Complements KS (sup gap) and
    // EMD (area) with the bin-level log-weighted view. Wired as its own
    // A/A NULL TEST: the two populations are the even/odd doc_id halves,
    // so PSI ≈ 0 is the calibrated expectation and any production use
    // swaps one half for yesterday's corpus. ENGINE-VERSION-PROOF: fixed-
    // width 64-char bins (no quantile estimation), add-one smoothing
    // keeps every ln operand positive, and the algebra folds to
    //   PSI = Σ_b (ĉ1·n̂2 − ĉ2·n̂1)·ln6(ĉ1·n̂2, ĉ2·n̂1) / (n̂1·n̂2·10⁶)
    // (hatted = smoothed counts/totals) — exact int64 cross-products
    // through LnGrid, ONE bare division.
    //
    // Scale shape: one (bin, half) agg over fixed-width bins → ≤\|bins\|
    // rows + 1-row totals broadcast → 1-row roll-up.
    "psi_length_parity" -> Q(
      fn = (s, dir) => {
        val b = Tables.load(s, dir, "documents")
          .select(expr("n_chars div 64").as("bin"), (col("doc_id") % 2).as("half"))
        val grid = b.groupBy("bin")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c1"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("c2"))
          .withColumn("h1", col("c1") + 1).withColumn("h2", col("c2") + 1)
        val tot = grid.agg(sum(col("h1")).as("n1"), sum(col("h2")).as("n2"),
          count(lit(1)).as("n_bins"))
        val j = grid.crossJoin(broadcast(tot))
        LnGrid.withLn6(j, col("h1") * col("n2"), col("h2") * col("n1"),
            "l6", "__psi_")
          .groupBy(col("n1"), col("n2"), col("n_bins"))
          .agg(sum((col("h1") * col("n2") - col("h2") * col("n1")) * col("l6"))
            .as("psum"))
          .select(col("n_bins"),
            (col("psum").cast("double")
              / (col("n1") * col("n2") * lit(1000000L)).cast("double")).as("psi"))
      },
      oracle = Some(
        s"""WITH b AS (SELECT n_chars // 64 AS bin, doc_id % 2 AS half FROM documents),
           |grid AS (SELECT bin,
           |                CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS h1,
           |                CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS h2
           |         FROM b GROUP BY bin),
           |tt AS (SELECT CAST(SUM(h1) AS BIGINT) AS n1, CAST(SUM(h2) AS BIGINT) AS n2,
           |              CAST(COUNT(*) AS BIGINT) AS n_bins FROM grid),
           |j AS (SELECT grid.*, tt.n1, tt.n2, tt.n_bins FROM grid, tt),
           |${LnGrid.sqlCtes("j", "h1 * n2", "h2 * n1", "l6", "psi_")},
           |a AS (SELECT n1, n2, n_bins,
           |             CAST(SUM((h1 * n2 - h2 * n1) * l6) AS BIGINT) AS psum
           |      FROM psi_out GROUP BY n1, n2, n_bins)
           |SELECT n_bins,
           |       CAST(psum AS DOUBLE) / CAST(n1 * n2 * 1000000 AS DOUBLE) AS psi
           |FROM a""".stripMargin)),

    "gini_user_revenue" -> Q(
      fn = (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
          .withColumn("g", expr("c div 100000"))
        val rn = u.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("c"), col("user_id"))))
        val offsets = u.groupBy("g").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select(col("g"), col("off"))
        rn.join(broadcast(offsets), Seq("g"))
          .withColumn("r", col("off") + col("rn"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
            sum(big(col("r")) * big(col("c"))).as("six"))
          .select(col("n").as("n_payers"), col("sx").as("total_cents"),
            when(col("sx") === 0, lit(0.0))
              .otherwise(
                (col("six") * 2 - (big(col("n")) + 1) * big(col("sx"))).cast("double")
                  / (big(col("n")) * big(col("sx"))).cast("double")).as("gini"))
      },
      oracle = Some(
        """WITH u AS (SELECT user_id,
          |             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
          |           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS i FROM u),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sx,
          |             SUM(CAST(i AS HUGEINT) * c) AS six
          |      FROM r)
          |SELECT n AS n_payers, sx AS total_cents,
          |       CASE WHEN sx = 0 THEN 0.0
          |            ELSE CAST(six * 2 - (CAST(n AS HUGEINT) + 1) * sx AS DOUBLE)
          |                 / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) END AS gini
          |FROM a""".stripMargin)),

    // ---- Wilson 95% interval on daily conversion (added r8) --------------
    // The error bars a daily conversion dashboard should draw (the normal
    // approximation collapses at small n / extreme p; Wilson does not).
    // Trials = active users per day, successes = users who purchased that
    // day. ENGINE-VERSION-PROOF algebra: with z = 49/25 (1.96 exactly as
    // a rational), the Wilson bounds reduce to
    //   (1250·n·x + 2401·n ∓ 49·s) / (1250·n² + 4802·n),
    //   s = ⌊√(n·(2500·x·(n−x) + 2401·n))⌋  via [[Q.isqrt]]
    // — every operand an exact int64 (radicand ≤ 1.4e17 at gate counts),
    // the floored radical deterministic on any engine (±1-repaired), and
    // each bound ONE bare division. The floor biases both bounds by
    // < 1/(1250n²) — far below the interval's own width, and identically
    // on both engines. p̂ is its own bare division.
    //
    // Scale shape: one (user, day) agg → day-grain agg → map-only bound
    // arithmetic; nothing corpus-sized past the first agg.
    "wilson_ci_daily" -> Q(
      fn = (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
          .groupBy("d").agg(count(lit(1)).as("n"), sum(col("c")).as("x"))
        val sCol = Q.isqrt(col("n") * (lit(2500L) * col("x") * (col("n") - col("x"))
          + lit(2401L) * col("n")))
        daily
          .withColumn("s", sCol)
          .select(col("d"), col("n"), col("x"),
            (col("x").cast("double") / col("n").cast("double")).as("p"),
            ((lit(1250L) * col("n") * col("x") + lit(2401L) * col("n")
              - lit(49L) * col("s")).cast("double")
              / (lit(1250L) * col("n") * col("n") + lit(4802L) * col("n"))
                .cast("double")).as("wilson_lo"),
            ((lit(1250L) * col("n") * col("x") + lit(2401L) * col("n")
              + lit(49L) * col("s")).cast("double")
              / (lit(1250L) * col("n") * col("n") + lit(4802L) * col("n"))
                .cast("double")).as("wilson_hi"))
          .orderBy("d")
      },
      oracle = Some(
        """WITH u AS (SELECT user_id, CAST(ts AS DATE) AS d,
          |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
          |           FROM events GROUP BY user_id, CAST(ts AS DATE)),
          |daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS x
          |          FROM u GROUP BY d),
          |r AS (SELECT *, n * (2500 * x * (n - x) + 2401 * n) AS rad FROM daily),
          |s0 AS (SELECT *, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) AS c0 FROM r),
          |w AS (SELECT d, n, x,
          |             CASE WHEN (c0 + 1) * (c0 + 1) <= rad THEN c0 + 1
          |                  WHEN c0 * c0 > rad THEN c0 - 1 ELSE c0 END AS s
          |      FROM s0)
          |SELECT d, n, x,
          |       CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
          |       CAST(1250 * n * x + 2401 * n - 49 * s AS DOUBLE)
          |         / CAST(1250 * n * n + 4802 * n AS DOUBLE) AS wilson_lo,
          |       CAST(1250 * n * x + 2401 * n + 49 * s AS DOUBLE)
          |         / CAST(1250 * n * n + 4802 * n AS DOUBLE) AS wilson_hi
          |FROM w ORDER BY d""".stripMargin)),

    // ---- two-proportion z-test on cohort conversion (added r8) -----------
    // The A/B-test workhorse Welch's t (means) doesn't cover: did cohort A
    // convert at a different RATE than cohort B? Cohorts = user_id parity
    // (the hash-split stand-in); conversion = user reached 'purchase'.
    // ENGINE-VERSION-PROOF by algebra: the pooled two-proportion z² is the
    // exact rational
    //   z² = (x₁n₂ − x₂n₁)²·(n₁+n₂) / (n₁n₂·(x₁+x₂)·(n₁+n₂−x₁−x₂))
    // — DECIMAL(38,0) cross-products (≤ ~6e24 at gate counts), z² ONE bare
    // division, and the α = 0.05 verdict decided by EXACT integer
    // cross-multiplication against 1.96² = 38416/10⁴ (no sqrt, no float
    // in the verdict — the daily_anomalies discipline). Degenerate pools
    // (all/none converted, empty cohort) emit NULL z² and 0 by CASE.
    //
    // Scale shape: one (user → cohort, converted) distinct agg → a 1-row
    // aggregate; nothing else.
    "prop_ztest" -> Q(
      fn = (s, dir) => {
        val u = Tables.load(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
          .select((col("user_id") % 2).as("cohort"), col("conv"))
        val a = u.agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("cohort") === 0, col("conv")).otherwise(0L)).as("x1"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("cohort") === 1, col("conv")).otherwise(0L)).as("x2"))
        val num = (big(col("x1")) * big(col("n2")) - big(col("x2")) * big(col("n1")))
        val den = big(col("n1")) * big(col("n2")) * (big(col("x1")) + big(col("x2"))) *
          (big(col("n1")) + big(col("n2")) - big(col("x1")) - big(col("x2")))
        a.select(col("n1"), col("x1"), col("n2"), col("x2"),
          when(col("n1") === 0, lit(null).cast("double"))
            .otherwise(col("x1").cast("double") / col("n1").cast("double")).as("p1"),
          when(col("n2") === 0, lit(null).cast("double"))
            .otherwise(col("x2").cast("double") / col("n2").cast("double")).as("p2"),
          when(den === 0, lit(null).cast("double"))
            .otherwise((num * num * (big(col("n1")) + big(col("n2")))).cast("double")
              / den.cast("double")).as("z2"),
          when(den === 0, lit(0))
            .otherwise(when(
              num * num * (big(col("n1")) + big(col("n2"))) * 10000 >= den * 38416,
              lit(1)).otherwise(lit(0))).cast("int").as("significant"))
      },
      oracle = Some(
        """WITH u AS (SELECT user_id % 2 AS cohort,
          |                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          |           FROM events GROUP BY user_id, CAST(ts AS DATE)),
          |a AS (SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |             CAST(SUM(CASE WHEN cohort = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
          |             CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          |             CAST(SUM(CASE WHEN cohort = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
          |      FROM u),
          |c AS (SELECT n1, x1, n2, x2,
          |             CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1 AS num,
          |             CAST(n1 AS HUGEINT) * n2 * (CAST(x1 AS HUGEINT) + x2)
          |               * (CAST(n1 AS HUGEINT) + n2 - x1 - x2) AS den
          |      FROM a)
          |SELECT n1, x1, n2, x2,
          |       CASE WHEN n1 = 0 THEN NULL
          |            ELSE CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1,
          |       CASE WHEN n2 = 0 THEN NULL
          |            ELSE CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS p2,
          |       CASE WHEN den = 0 THEN NULL
          |            ELSE CAST(num * num * (CAST(n1 AS HUGEINT) + n2) AS DOUBLE)
          |                 / CAST(den AS DOUBLE) END AS z2,
          |       CAST(CASE WHEN den = 0 THEN 0
          |                 WHEN num * num * (CAST(n1 AS HUGEINT) + n2) * 10000
          |                      >= den * 38416 THEN 1
          |                 ELSE 0 END AS INTEGER) AS significant
          |FROM c""".stripMargin)),

    // ---- Benford first-digit audit of the event value column (r8) --------
    // The classic fabricated-/synthetic-data screen: the first significant
    // digit of naturally occurring magnitudes follows P(d) = log₁₀(1+1/d);
    // uniform or templated generators flunk it loudly. Run over the event
    // `value` column — the pipeline's "does this telemetry look organic"
    // check (and, on this corpus, a measurement of HOW synthetic the
    // generator is). ENGINE-VERSION-PROOF construction: the digit is taken
    // from the INTEGER cents ⌊value·100⌋ (one IEEE multiply + floor —
    // correctly rounded and bit-identical on any engine — then exact
    // int→string); the Benford grid is 9 floored micro-probability INTEGER
    // LITERALS ⌊log₁₀(1+1/d)·10⁶⌋ spelled identically in both dialects
    // (the 693147-ln2 precedent — no libm call at query time); dev6 =
    // o·10⁶ − n·p6 is exact int64 (signed excess in micro-probability
    // units); share is ONE bare division.
    //
    // Scale shape: one map-side digit projection → 9-bucket hash agg; the
    // 9-row digit spine and the 1-row total broadcast — nothing
    // corpus-sized past the first agg.
    "benford_first_digit" -> Q(
      fn = (s, dir) => {
        val p6 = expr(
          """CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
            | WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
            | WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
            | ELSE 45757 END""".stripMargin)
        val d = Tables.load(s, dir, "events")
          .select(expr("cast(floor(value * 100) as bigint)").as("cents"))
          .filter(col("cents") >= 1)
          .select(expr("cast(substring(cast(cents as string), 1, 1) as int)").as("digit"))
        val obs = d.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = d.agg(count(lit(1)).as("n"))
        s.range(1, 10).select(col("id").cast("int").as("digit"))
          .join(obs, Seq("digit"), "left")
          .na.fill(0L, Seq("n_obs"))
          .crossJoin(broadcast(tot))
          .withColumn("benford_p6", p6)
          .select(col("digit"), col("n_obs"), col("benford_p6"),
            (col("n_obs") * lit(1000000L) - col("n") * col("benford_p6")).as("dev6"),
            when(col("n") === 0, lit(null).cast("double"))
              .otherwise(col("n_obs").cast("double") / col("n").cast("double"))
              .as("share"))
          .orderBy("digit")
      },
      oracle = Some(
        """WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents
          |           FROM events WHERE value IS NOT NULL),
          |d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
          |      FROM c WHERE cents >= 1),
          |o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
          |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
          |sp AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)),
          |j AS (SELECT sp.digit, COALESCE(o.n_obs, 0) AS n_obs,
          |             CASE sp.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
          |                  WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
          |                  WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
          |                  ELSE 45757 END AS benford_p6
          |      FROM sp LEFT JOIN o ON sp.digit = o.digit)
          |SELECT digit, n_obs, benford_p6,
          |       n_obs * 1000000 - nt.n * benford_p6 AS dev6,
          |       CASE WHEN nt.n = 0 THEN NULL
          |            ELSE CAST(n_obs AS DOUBLE) / CAST(nt.n AS DOUBLE) END AS share
          |FROM j, nt ORDER BY digit""".stripMargin)),

    // ---- Theil–Sen robust trend of daily volumes (added r9) --------------
    // The robust slope estimator (median of all pairwise slopes, Sen 1968)
    // for each event type's daily-volume series — up to ~29% contaminated
    // days cannot move it, where the OLS slope (ols_length_quality's
    // machinery applied to time) chases every outlier burst. The number a
    // capacity review wants beside mad_anomalies' robust level: "is this
    // stream growing, and at what rate, ignoring incident days".
    //
    // ENGINE-VERSION-PROOF: each pairwise slope is the exact rational
    // (c_j − c_i)/(d_j − d_i); the median is selected by ORDER ON AN EXACT
    // INTEGER KEY — the slope offset-shifted positive and floored to the
    // 10⁻⁶ grid, key = (num + 10⁷·den)·10⁶ div den (monotone in the true
    // rational; 10⁷ bounds the daily count by ingest contract — widen to
    // DECIMAL at larger scales), with (num, den, d_i, d_j) as the total
    // tie-break, so both engines pick the identical pair. The lower median
    // (nearest-rank (P+1) div 2) avoids averaging two rationals. Reported
    // slope is ONE bare division of the chosen pair's exact ints.
    //
    // Scale shape: the pair join runs over the DAY-GRAIN aggregate —
    // calendar-span bounded (span²/2 pairs per type at any corpus size,
    // the changepoint_daily argument), never corpus rows; the rank window
    // partitions by type over that bounded pair frame.
    "theil_sen_trend" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val a = daily.select(col("event_type"), col("d").as("da"), col("c").as("ca"))
        val b = daily.select(col("event_type"), col("d").as("db"), col("c").as("cb"))
        val pairs = a.join(b, Seq("event_type")).filter(col("db") > col("da"))
          .withColumn("num", col("cb") - col("ca"))
          .withColumn("den", datediff(col("db"), col("da")).cast("long"))
          .withColumn("key",
            expr("((num + 10000000L * den) * 1000000L) div den"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("key"), col("num"), col("den"), col("da"), col("db"))
        pairs
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("np", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("rn") === expr("(np + 1) div 2"))
          .select(col("event_type"), col("np").as("n_pairs"),
            col("num").as("slope_num"), col("den").as("slope_den"),
            (col("num").cast("double") / col("den").cast("double"))
              .as("slope_per_day"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |pairs AS (
          |  SELECT a.event_type,
          |         b.c - a.c AS num,
          |         CAST(b.d - a.d AS BIGINT) AS den,
          |         a.d AS da, b.d AS db
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND b.d > a.d),
          |keyed AS (
          |  SELECT *, (num + 10000000 * den) * 1000000 // den AS key
          |  FROM pairs),
          |ranked AS (
          |  SELECT *,
          |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
          |             ORDER BY key, num, den, da, db) AS BIGINT) AS rn,
          |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
          |  FROM keyed)
          |SELECT event_type, np AS n_pairs, num AS slope_num, den AS slope_den,
          |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope_per_day
          |FROM ranked WHERE rn = (np + 1) // 2
          |ORDER BY event_type""".stripMargin)),

    // ---- Mann–Kendall trend test on daily volumes (added r9) -------------
    // The distribution-free trend VERDICT beside theil_sen_trend's slope
    // (the two are the standard pairing: MK decides IF a monotone trend
    // exists, Theil–Sen says how steep): S = Σ_{i<j} sign(c_j − c_i) over
    // the day-ordered series, with the tie-corrected variance
    // 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5). The α = 0.05 verdict is
    // decided ENTIRELY in exact integers by cross-multiplication:
    //   significant ⟺ S ≠ 0 ∧ 18·10⁴·(|S|−1)² > 38416·var18
    // (1.96² = 3.8416 — the prop_ztest constant discipline; the ∓1 is the
    // standard continuity correction). No float can flip the verdict; the
    // reported z is a fixed chain of correctly-rounded IEEE ops (÷, sqrt,
    // ÷) over exact ints with identical parenthesization on both engines.
    //
    // Scale shape: pair sums and tie groups both live on the day-grain
    // aggregate (calendar-bounded); cross-products widened to
    // DECIMAL(38,0)/HUGEINT. One corpus pass total.
    "mann_kendall_trend" -> Q(
      fn = (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val a = daily.select(col("event_type"), col("d").as("da"), col("c").as("ca"))
        val b = daily.select(col("event_type"), col("d").as("db"), col("c").as("cb"))
        val sPart = a.join(b, Seq("event_type")).filter(col("db") > col("da"))
          .groupBy("event_type")
          .agg(sum(when(col("cb") > col("ca"), 1L)
            .when(col("cb") < col("ca"), -1L).otherwise(0L)).as("s_stat"))
        val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n"))
        val ties = daily.groupBy(col("event_type"), col("c"))
          .agg(count(lit(1)).as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tt"))
        val m = sPart.join(nDays, Seq("event_type")).join(ties, Seq("event_type"))
          .withColumn("var18",
            col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tt"))
        val absS = abs(col("s_stat"))
        m.select(col("event_type"), col("n").as("n_days"), col("s_stat"),
            col("var18"),
            when(col("s_stat") === 0 || col("var18") <= 0, lit(0.0d))
              .otherwise((col("s_stat") - signum(col("s_stat")).cast("long"))
                .cast("double")
                / sqrt(col("var18").cast("double") / lit(18.0d)))
              .as("z_mk"),
            when(col("s_stat") =!= 0 && col("var18") > 0
                && big(lit(180000L)) * big(absS - 1) * big(absS - 1)
                   > big(lit(38416L)) * big(col("var18")),
                signum(col("s_stat")).cast("int"))
              .otherwise(lit(0)).as("trend"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |sp AS (
          |  SELECT a.event_type,
          |         CAST(SUM(CASE WHEN b.c > a.c THEN 1
          |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND b.d > a.d
          |  GROUP BY a.event_type),
          |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          |       FROM daily GROUP BY event_type),
          |ti AS (SELECT event_type,
          |              CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
          |       FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
          |             FROM daily GROUP BY event_type, c)
          |       GROUP BY event_type),
          |m AS (SELECT sp.event_type, sp.s_stat, nd.n,
          |             n * (n - 1) * (2 * n + 5) - ti.tt AS var18
          |      FROM sp JOIN nd USING (event_type) JOIN ti USING (event_type))
          |SELECT event_type, n AS n_days, s_stat, var18,
          |       CASE WHEN s_stat = 0 OR var18 <= 0 THEN 0.0
          |            ELSE CAST(s_stat - CAST(sign(s_stat) AS BIGINT) AS DOUBLE)
          |                 / sqrt(CAST(var18 AS DOUBLE) / 18.0) END AS z_mk,
          |       CASE WHEN s_stat <> 0 AND var18 > 0
          |                 AND CAST(180000 AS HUGEINT) * (abs(s_stat) - 1)
          |                     * (abs(s_stat) - 1)
          |                     > CAST(38416 AS HUGEINT) * var18
          |            THEN CAST(sign(s_stat) AS INTEGER) ELSE 0 END AS trend
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- Wald–Wolfowitz runs test on daily volumes (added r9) ------------
    // Randomness-of-sequence check per event type: the daily series
    // dichotomized against its own median (mad_anomalies' exact med2
    // doubling trick — ties with the median are excluded, the standard
    // treatment), runs of consecutive same-side days counted, and the run
    // count tested against its null distribution. Too FEW runs = regime
    // clumping (level shifts, weekly cycles — the pattern cusum/changepoint
    // then localize); too MANY = alternating/oscillating load. Completes
    // the nonparametric triad: mann_kendall (monotone trend), runs_test
    // (serial randomness), fano_burstiness (dispersion).
    //
    // ENGINE-VERSION-PROOF: with m = n1·n2, μ = 1 + 2m/n and
    // σ² = 2m(2m−n)/(n²(n−1)), the α = 0.05 verdict is the exact integer
    // cross-multiplication (A = R·n − n − 2m, so R − μ = A/n):
    //   significant ⟺ A²·(n−1)·10⁴ > 38416·2m·(2m−n)
    // — DECIMAL(38,0)/HUGEINT cross-products, no float in the verdict; the
    // reported z = A / sqrt(2m(2m−n)/(n−1)) is a fixed chain of
    // correctly-rounded IEEE ops (÷ inside, sqrt, final ÷).
    //
    // Scale shape: one day-grain hash agg; the median list and the lag
    // window both live on the calendar-bounded per-type series.
    "runs_test_volume" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val med = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n0"), sort_array(collect_list(col("c"))).as("arr"))
          .select(col("event_type"), expr(
            "element_at(arr, int((n0 - 1) div 2) + 1) + element_at(arr, int(n0 div 2) + 1)")
            .as("med2"))
        val signed = daily.join(med, Seq("event_type"))
          .withColumn("sgn",
            when(col("c") * 2 > col("med2"), 1L)
              .when(col("c") * 2 < col("med2"), -1L).otherwise(0L))
          .filter(col("sgn") =!= 0)
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val m = signed
          .withColumn("prev", lag(col("sgn"), 1).over(w))
          .groupBy("event_type")
          .agg(
            sum(when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
              .otherwise(0L)).as("runs"),
            sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n2"))
          .withColumn("n", col("n1") + col("n2"))
          .withColumn("m2", lit(2L) * col("n1") * col("n2"))
          .withColumn("a", col("runs") * col("n") - col("n") - col("m2"))
        m.select(col("event_type"), col("n").as("n_days_used"),
            col("n1").as("n_above"), col("n2").as("n_below"), col("runs"),
            when(col("n1") === 0 || col("n2") === 0 || col("n") < 2
                || col("m2") * (col("m2") - col("n")) <= 0, lit(0.0d))
              .otherwise(col("a").cast("double")
                / sqrt((col("m2") * (col("m2") - col("n"))).cast("double")
                  / (col("n") - 1).cast("double")))
              .as("z_runs"),
            when(col("n1") > 0 && col("n2") > 0 && col("n") >= 2
                && col("m2") * (col("m2") - col("n")) > 0
                && big(col("a")) * big(col("a")) * big(col("n") - 1) * 10000L
                   > big(lit(38416L)) * big(col("m2")) * big(col("m2") - col("n")),
                lit(1)).otherwise(lit(0)).as("nonrandom"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |med AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n0,
          |               list_sort(list(c)) AS arr
          |        FROM daily GROUP BY event_type),
          |m2 AS (SELECT event_type,
          |              arr[CAST((n0 - 1) // 2 AS INTEGER) + 1]
          |                + arr[CAST(n0 // 2 AS INTEGER) + 1] AS med2
          |       FROM med),
          |sg AS (SELECT daily.event_type, daily.d,
          |              CASE WHEN daily.c * 2 > m2.med2 THEN 1
          |                   WHEN daily.c * 2 < m2.med2 THEN -1 ELSE 0 END AS sgn
          |       FROM daily JOIN m2 USING (event_type)),
          |nz AS (SELECT *, LAG(sgn) OVER (PARTITION BY event_type ORDER BY d) AS prev
          |       FROM sg WHERE sgn <> 0),
          |st AS (SELECT event_type,
          |              CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn
          |                            THEN 1 ELSE 0 END) AS BIGINT) AS runs,
          |              CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |              CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          |       FROM nz GROUP BY event_type),
          |fx AS (SELECT *, n1 + n2 AS n, 2 * n1 * n2 AS m2x FROM st),
          |fy AS (SELECT *, runs * n - n - m2x AS a FROM fx)
          |SELECT event_type, n AS n_days_used, n1 AS n_above, n2 AS n_below, runs,
          |       CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 OR m2x * (m2x - n) <= 0 THEN 0.0
          |            ELSE CAST(a AS DOUBLE)
          |                 / sqrt(CAST(m2x * (m2x - n) AS DOUBLE)
          |                        / CAST(n - 1 AS DOUBLE)) END AS z_runs,
          |       CASE WHEN n1 > 0 AND n2 > 0 AND n >= 2 AND m2x * (m2x - n) > 0
          |                 AND CAST(a AS HUGEINT) * a * (n - 1) * 10000
          |                     > CAST(38416 AS HUGEINT) * m2x * (m2x - n)
          |            THEN 1 ELSE 0 END AS nonrandom
          |FROM fy ORDER BY event_type""".stripMargin)),

    // ---- Pareto curve: top-p% user share of revenue (added r9) ------------
    // The whale-curve POINTS a monetization review quotes ("top 1% of
    // payers = X% of revenue") — gini_user_revenue compresses the whole
    // curve into one number, user_ltv_quantiles gives the per-user value
    // axis; this reads off the canonical cutoffs p ∈ {1, 5, 10, 25}.
    // Top-p% count = ⌈p·n/100⌉ (exact integer ceil), membership by the
    // user's revenue-DESCENDING rank.
    //
    // Corpus-scale ranks use the gini_user_revenue STITCHED discipline:
    // shard by the monotone revenue bucket (c div 10⁵, descending), rank
    // within shard, add tiny-frame offsets — provably ≡ the global
    // ROW_NUMBER the ORACLE spells directly (the hash match is the
    // stitching proof, the quality_rank_parity precedent). All sums exact
    // cents; share is ONE bare division of exact ints.
    //
    // Scale shape: user revenue agg → g-partitioned rank windows + a
    // ≤|buckets| offsets frame → one 1-row conditional-sum agg → a 4-row
    // stack. Never a single-reducer window over users.
    "pareto_user_share" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
          .withColumn("g", expr("c div 100000"))
        val rn = u.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("c").desc, col("user_id"))))
        val offsets = u.groupBy("g").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            coalesce(sum(col("cnt")).over(
              Window.orderBy(col("g").desc).rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select(col("g"), col("off"))
        val ranked = rn.join(broadcast(offsets), Seq("g"))
          .withColumn("r", col("off") + col("rn"))
        def kOf(p: Int) = expr(s"($p * n + 99) div 100")
        val m = ranked
          .agg(count(lit(1)).as("n"), sum(col("c")).as("total"))
        val sums = ranked.crossJoin(broadcast(m))
          .agg(max(col("n")).as("n"), max(col("total")).as("total"),
            sum(when(col("r") <= kOf(1), col("c")).otherwise(0L)).as("c1"),
            sum(when(col("r") <= kOf(5), col("c")).otherwise(0L)).as("c5"),
            sum(when(col("r") <= kOf(10), col("c")).otherwise(0L)).as("c10"),
            sum(when(col("r") <= kOf(25), col("c")).otherwise(0L)).as("c25"))
        // degenerate guard: with ZERO payers the no-groupBy agg still emits
        // one all-NULL row while the oracle's `FROM r, m GROUP BY` emits 0
        // rows — drop it so both engines agree on the empty corpus
        sums.filter(col("n").isNotNull && col("n") > 0)
          .select(col("n"), col("total"),
            expr("stack(4, 1L, (1 * n + 99) div 100, c1, 5L, (5 * n + 99) div 100, c5, " +
              "10L, (10 * n + 99) div 100, c10, 25L, (25 * n + 99) div 100, c25) " +
              "as (pct, k_users, cents_topk)"))
          .select(col("pct"), col("k_users"), col("cents_topk"),
            col("n").as("n_payers"), col("total").as("total_cents"),
            when(col("total") === 0, lit(0.0d))
              .otherwise(col("cents_topk").cast("double") / col("total").cast("double"))
              .as("share"))
          .orderBy("pct")
      },
      oracle = Some(
        """WITH u AS (SELECT user_id,
          |             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
          |           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |r AS (SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS r
          |      FROM u),
          |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS total
          |      FROM u),
          |s AS (SELECT n, total,
          |             CAST(SUM(CASE WHEN r.r <= (1 * n + 99) // 100 THEN c ELSE 0 END) AS BIGINT) AS c1,
          |             CAST(SUM(CASE WHEN r.r <= (5 * n + 99) // 100 THEN c ELSE 0 END) AS BIGINT) AS c5,
          |             CAST(SUM(CASE WHEN r.r <= (10 * n + 99) // 100 THEN c ELSE 0 END) AS BIGINT) AS c10,
          |             CAST(SUM(CASE WHEN r.r <= (25 * n + 99) // 100 THEN c ELSE 0 END) AS BIGINT) AS c25
          |      FROM r, m GROUP BY n, total),
          |st AS (SELECT 1 AS pct, (1 * n + 99) // 100 AS k_users, c1 AS cents_topk,
          |              n, total FROM s
          |       UNION ALL
          |       SELECT 5, (5 * n + 99) // 100, c5, n, total FROM s
          |       UNION ALL
          |       SELECT 10, (10 * n + 99) // 100, c10, n, total FROM s
          |       UNION ALL
          |       SELECT 25, (25 * n + 99) // 100, c25, n, total FROM s)
          |SELECT CAST(pct AS BIGINT) AS pct, CAST(k_users AS BIGINT) AS k_users,
          |       cents_topk, n AS n_payers, total AS total_cents,
          |       CASE WHEN total = 0 THEN 0.0
          |            ELSE CAST(cents_topk AS DOUBLE) / CAST(total AS DOUBLE) END AS share
          |FROM st ORDER BY pct""".stripMargin)),

    // ---- calibration curve of the quality score (added r9) ----------------
    // auc_dup_quality measures whether a signal DISCRIMINATES; this
    // measures whether it's CALIBRATED — the reliability diagram: per
    // quality-score band (q6 div 10⁵, the spearman banding), observed
    // duplicated-text rate vs the band's mean predicted score. A signal
    // can have great AUC and terrible calibration (every thresholding
    // decision then sits at the wrong operating point) — the standard ML
    // eval pairing, applied to the registry's own quality score and
    // dup_ngram_ratio's df ≥ 2 label (both spelled VERBATIM from their
    // source queries — the rater_agreement no-drift discipline).
    //
    // Float parity: per band, rate and mean score are ONE bare division
    // each; the calibration gap numerator |10⁶·pos − Σq6| is an exact
    // int64 emitted alongside (Σ over bands / (N·10⁶) is the ECE a
    // dashboard derives — kept per-band so the table shows WHERE the
    // miscalibration lives).
    //
    // Scale shape: the label pass is dup_ngram_ratio's digest plan; the
    // score is a map-side projection; one ≤11-band hash agg ends it.
    "score_calibration" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tf = docs.withColumn("toks", split(col("text"), " "))
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
        val lab = tf
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"))
        val scored = docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .withColumn("y",
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long"))
          .join(lab, Seq("doc_id"), "left")
          .select(expr("y div 100000").as("band"), col("y"),
            coalesce(col("pos"), lit(0L)).as("pos"))
        scored.groupBy("band")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
            sum(col("y")).as("sq6"))
          .select(col("band"), col("n"), col("n_pos"),
            (col("n_pos").cast("double") / col("n").cast("double")).as("dup_rate"),
            (col("sq6").cast("double") / (col("n") * 1000000L).cast("double"))
              .as("mean_score"),
            abs(col("n_pos") * 1000000L - col("sq6")).as("gap6_num"))
          .orderBy("band")
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |occ AS (SELECT doc_id,
           |               UNNEST(list_transform(range(len(toks) - 4),
           |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
           |        FROM d WHERE len(toks) >= 5),
           |dfx AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh),
           |lab AS (SELECT occ.doc_id, MAX(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS pos
           |        FROM occ JOIN dfx USING (gh) GROUP BY occ.doc_id),
           |t AS (SELECT doc_id, string_split(text, ' ') AS toks,
           |             length(text) AS nc FROM documents),
           |q AS (SELECT doc_id,
           |             CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                  + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                        w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                        AS DOUBLE) / len(toks))
           |                  + 0.3 * least(1.0, CAST(nc AS DOUBLE) / 200.0))
           |                  * 1000000.0) AS BIGINT) AS y
           |      FROM t),
           |sc AS (SELECT y // 100000 AS band, y, COALESCE(lab.pos, 0) AS pos
           |       FROM q LEFT JOIN lab USING (doc_id)),
           |m AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           |             CAST(SUM(pos) AS BIGINT) AS n_pos,
           |             CAST(SUM(y) AS BIGINT) AS sq6
           |      FROM sc GROUP BY band)
           |SELECT band, n, n_pos,
           |       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS dup_rate,
           |       CAST(sq6 AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_score,
           |       abs(n_pos * 1000000 - sq6) AS gap6_num
           |FROM m ORDER BY band""".stripMargin)),

    // ---- two-sided trimmed mean of event value per type (added r9) --------
    // The robust-location companion of mad_anomalies' robust scale and
    // welch_ttest's raw means: the 5%-per-side trimmed mean of the value
    // column per event type — heavy tails (exactly what hill_tail_index
    // and benford exist to flag) can move a raw mean arbitrarily; the
    // trimmed mean bounds any tail's influence. Computed EXACTLY on the
    // integer cents value grid: with per-value counts and cumulative
    // positions, each grid value contributes
    //   overlap = max(0, min(cum, n−k) − max(cum−cnt, k))   (k = n div 20)
    // occurrences to the trimmed window [k, n−k) — all int64, no sort of
    // corpus rows, no percentile_approx semantics. Both means are ONE
    // bare division of exact cents sums.
    //
    // Scale shape: one (type, cents) hash agg; the cumulative window
    // partitions by type over the value-domain-bounded grid (the
    // ks_source_lengths argument); per-type totals join back broadcast.
    "trimmed_mean_value" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val grid = Tables.load(s, dir, "events")
          .select(col("event_type"),
            expr("cast(floor(value * 100) as bigint)").as("cents"))
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
        val tot = grid.groupBy("event_type")
          .agg(sum(col("cnt")).as("n"), sum(col("cents") * col("cnt")).as("sum_cents"))
          .withColumn("k", expr("n div 20"))
        val win = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        grid.withColumn("cum", sum(col("cnt")).over(win))
          .join(broadcast(tot), Seq("event_type"))
          .withColumn("ov",
            greatest(lit(0L),
              least(col("cum"), col("n") - col("k"))
                - greatest(col("cum") - col("cnt"), col("k"))))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"), max(col("k")).as("k"),
            max(col("sum_cents")).as("sum_cents"),
            sum(col("ov") * col("cents")).as("trim_cents"),
            sum(col("ov")).as("trim_n"))
          .select(col("event_type"), col("n"), col("k"),
            (col("sum_cents").cast("double") / (col("n") * 100L).cast("double"))
              .as("mean_value"),
            when(col("trim_n") === 0, lit(null).cast("double"))
              .otherwise(col("trim_cents").cast("double")
                / (col("trim_n") * 100L).cast("double"))
              .as("trimmed_mean_value"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH grid AS (
          |  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY event_type, CAST(FLOOR(value * 100) AS BIGINT)),
          |tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
          |               CAST(SUM(cents * cnt) AS BIGINT) AS sum_cents
          |        FROM grid GROUP BY event_type),
          |tk AS (SELECT *, n // 20 AS k FROM tot),
          |c AS (SELECT grid.event_type, cents, cnt,
          |             SUM(cnt) OVER (PARTITION BY grid.event_type
          |                            ORDER BY cents) AS cum,
          |             n, k, sum_cents
          |      FROM grid JOIN tk USING (event_type)),
          |ov AS (SELECT *,
          |              GREATEST(0, LEAST(cum, n - k) - GREATEST(cum - cnt, k)) AS ovl
          |       FROM c),
          |m AS (SELECT event_type, MAX(n) AS n, MAX(k) AS k,
          |             MAX(sum_cents) AS sum_cents,
          |             CAST(SUM(ovl * cents) AS BIGINT) AS trim_cents,
          |             CAST(SUM(ovl) AS BIGINT) AS trim_n
          |      FROM ov GROUP BY event_type)
          |SELECT event_type, n, k,
          |       CAST(sum_cents AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean_value,
          |       CASE WHEN trim_n = 0 THEN NULL
          |            ELSE CAST(trim_cents AS DOUBLE)
          |                 / CAST(trim_n * 100 AS DOUBLE) END AS trimmed_mean_value
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- winsorized mean per event type (added r10) ------------------------
    // trimmed_mean_value's sibling: winsorizing CLAMPS the k tail values
    // to the (k+1)-th / (n−k)-th order statistics instead of dropping
    // them — the robust mean that keeps n constant (the survey-stats
    // convention when group sizes must stay comparable). Same exact
    // cents-grid machinery: winsorized sum = trimmed interior + k·low +
    // k·high where low/high are exact order statistics from the
    // cumulative grid (min v with cum ≥ k+1 / cum ≥ n−k). ONE bare
    // division; spec replays the definitional clamp.
    //
    // Scale shape: trimmed_mean_value's plan exactly — one (type, cents)
    // agg, a type-partitioned cumulative window over the value grid,
    // broadcast totals, ≤|types| roll-up.
    "winsorized_mean_value" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val grid = Tables.load(s, dir, "events")
          .select(col("event_type"),
            expr("cast(floor(value * 100) as bigint)").as("cents"))
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
        val tot = grid.groupBy("event_type")
          .agg(sum(col("cnt")).as("n"))
          .withColumn("k", expr("n div 20"))
        val win = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        grid.withColumn("cum", sum(col("cnt")).over(win))
          .join(broadcast(tot), Seq("event_type"))
          .withColumn("ov",
            greatest(lit(0L),
              least(col("cum"), col("n") - col("k"))
                - greatest(col("cum") - col("cnt"), col("k"))))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"), max(col("k")).as("k"),
            sum(col("ov") * col("cents")).as("trim_cents"),
            min(when(col("cum") >= col("k") + 1, col("cents"))).as("low_cents"),
            min(when(col("cum") >= col("n") - col("k"), col("cents"))).as("high_cents"))
          .select(col("event_type"), col("n"), col("k"),
            col("low_cents"), col("high_cents"),
            ((col("trim_cents") + col("k") * col("low_cents")
              + col("k") * col("high_cents")).cast("double")
              / (col("n") * 100L).cast("double")).as("winsorized_mean_value"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH grid AS (
          |  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY event_type, CAST(FLOOR(value * 100) AS BIGINT)),
          |tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
          |               CAST(SUM(cnt) AS BIGINT) // 20 AS k
          |        FROM grid GROUP BY event_type),
          |c AS (SELECT grid.event_type, cents, cnt,
          |             SUM(cnt) OVER (PARTITION BY grid.event_type ORDER BY cents) AS cum,
          |             n, k
          |      FROM grid JOIN tot USING (event_type)),
          |m AS (SELECT event_type, MAX(n) AS n, MAX(k) AS k,
          |             CAST(SUM(GREATEST(0, LEAST(cum, n - k) - GREATEST(cum - cnt, k))
          |                      * cents) AS BIGINT) AS trim_cents,
          |             MIN(CASE WHEN cum >= k + 1 THEN cents END) AS low_cents,
          |             MIN(CASE WHEN cum >= n - k THEN cents END) AS high_cents
          |      FROM c GROUP BY event_type)
          |SELECT event_type, n, k, low_cents, high_cents,
          |       CAST(trim_cents + k * low_cents + k * high_cents AS DOUBLE)
          |         / CAST(n * 100 AS DOUBLE) AS winsorized_mean_value
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- Kendall's τ-b: length vs quality, per source (added r10) ---------
    // The rank-association companion of spearman_length_quality: τ-b is
    // the concordant-vs-discordant pair probability — more robust to the
    // heavy ties both variables carry (length repeats, 11 quality bands)
    // because the b-correction removes tied pairs from BOTH margins.
    // Computed EXACTLY on the (length, band) contingency grid: concordant
    // C = Σ c₁c₂ over cell pairs with x₁<x₂ ∧ y₁<y₂, discordant D the
    // y₁>y₂ mirror, tie masses Tx/Ty from the marginals — never a pairwise
    // join over docs. Denominator √((n₀−Tx)(n₀−Ty)) is computed as
    // √(n₀−Tx)·√(n₀−Ty): each factor fits int64 for n ≤ ~4.3e9 docs per
    // source, the int64→double cast and both sqrts are correctly-rounded
    // IEEE ops, and the product/division are single IEEE ops — the whole
    // chain is bit-identical cross-engine at ANY corpus size (the grid6
    // doctrine's trusted-op list), with no int64 product that could wrap
    // (the r10 form squared ~n²/2 factors and wrapped at ~10⁵ docs/
    // source; ADVICE r10). C and D are exact int64 sums bounded by n₀.
    //
    // Scale shape: per-doc map pass → one (source, x, y) hash agg; the
    // pair join runs over the GRID (value-domain × 11 bands, the
    // ks_source_lengths argument), never docs; ≤|sources| roll-up.
    "kendall_tau_length_quality" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val scored = docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .withColumn("y",
            expr("""floor((0.4 * least(1.0, cast(n_tokens as double) / 50.0)
                    | + 0.3 * (1.0 - cast(n_stop as double) / n_tokens)
                    | + 0.3 * least(1.0, cast(length(text) as double) / 200.0))
                    | * 1000000.0) div 100000""".stripMargin))
          .select(col("source"), col("n_chars").as("x"), col("y"))
        val grid = scored.groupBy("source", "x", "y").agg(count(lit(1)).as("c"))
        val tot = grid.groupBy("source").agg(sum(col("c")).as("n"))
        val tx = grid.groupBy("source", "x").agg(sum(col("c")).as("cx"))
          .groupBy("source").agg(sum(expr("(cx * (cx - 1)) div 2")).as("tx"))
        val ty = grid.groupBy("source", "y").agg(sum(col("c")).as("cy"))
          .groupBy("source").agg(sum(expr("(cy * (cy - 1)) div 2")).as("ty"))
        val pairs = grid.as("a").join(grid.as("b"),
            col("a.source") === col("b.source") && col("a.x") < col("b.x"))
          .groupBy(col("a.source").as("source"))
          .agg(
            sum(when(col("a.y") < col("b.y"), col("a.c") * col("b.c")).otherwise(0L)).as("concordant"),
            sum(when(col("a.y") > col("b.y"), col("a.c") * col("b.c")).otherwise(0L)).as("discordant"))
        tot.join(tx, Seq("source")).join(ty, Seq("source"))
          .join(pairs, Seq("source"), "left")
          .select(col("source"), col("n"),
            coalesce(col("concordant"), lit(0L)).as("concordant"),
            coalesce(col("discordant"), lit(0L)).as("discordant"),
            expr("(n * (n - 1)) div 2").as("n0"), col("tx"), col("ty"))
          .withColumn("denom",
            StatQueries.kendallDenom(col("n0"), col("tx"), col("ty")))
          .select(col("source"), col("n"), col("concordant"), col("discordant"),
            when(col("denom") === 0.0d, lit(null).cast("double"))
              .otherwise((col("concordant") - col("discordant")).cast("double")
                / col("denom")).as("tau_b"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT source, n_chars AS x, string_split(text, ' ') AS toks, text
           |           FROM documents),
           |sc AS (SELECT source, x,
           |              CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                   + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                         w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                         AS DOUBLE) / len(toks))
           |                   + 0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 200.0))
           |                   * 1000000.0) AS BIGINT) // 100000 AS y
           |       FROM t),
           |grid AS (SELECT source, x, y, CAST(COUNT(*) AS BIGINT) AS c
           |         FROM sc GROUP BY source, x, y),
           |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM grid GROUP BY source),
           |txm AS (SELECT source, CAST(SUM(cx * (cx - 1) // 2) AS BIGINT) AS tx FROM (
           |          SELECT source, x, SUM(c) AS cx FROM grid GROUP BY source, x) q
           |        GROUP BY source),
           |tym AS (SELECT source, CAST(SUM(cy * (cy - 1) // 2) AS BIGINT) AS ty FROM (
           |          SELECT source, y, SUM(c) AS cy FROM grid GROUP BY source, y) q
           |        GROUP BY source),
           |p AS (SELECT a.source,
           |             CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS BIGINT) AS concordant,
           |             CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS BIGINT) AS discordant
           |      FROM grid a JOIN grid b ON a.source = b.source AND a.x < b.x
           |      GROUP BY a.source),
           |m AS (SELECT tot.source, n,
           |             COALESCE(concordant, 0) AS concordant,
           |             COALESCE(discordant, 0) AS discordant,
           |             n * (n - 1) // 2 AS n0, tx, ty
           |      FROM tot JOIN txm USING (source) JOIN tym USING (source)
           |      LEFT JOIN p ON p.source = tot.source),
           |d AS (SELECT *,
           |             sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE)) AS denom
           |      FROM m)
           |SELECT source, n, concordant, discordant,
           |       CASE WHEN denom = 0 THEN NULL
           |            ELSE CAST(concordant - discordant AS DOUBLE) / denom
           |       END AS tau_b
           |FROM d ORDER BY source""".stripMargin)),

    // ---- Hodges-Lehmann shift estimate: doc length between groups (r12) ---
    // The LOCATION companion of cliffs_delta_length and mann_whitney_length
    // over the SAME two-group split (source id < 10 vs rest, the ks
    // spelling): the HL estimator = median of all n1*n2 pairwise
    // differences x1 - x2 — the shift the rank tests detect, in CHARACTERS
    // (the number a curation rule can act on), robust where the mean
    // difference is outlier-owned. Computed exactly on the value grid:
    // differences enumerate GRID x GRID (value-domain², never docs²) with
    // pair-mass weights c1*c2; the weighted lower/upper middle elements
    // come off ONE cumulative window over the difference grid; hl is the
    // single bare division (lo+hi)/2. ALL pair-mass arithmetic is
    // DECIMAL(38,0)/HUGEINT — n1*n2 wraps int64 past ~3e9 docs per group.
    //
    // Scale shape: one value-grid agg → grid x broadcast-grid product
    // (value-domain bounded, R1-whitelisted) → difference-grid agg → ONE
    // cumulative window over it (R2-whitelisted, bound = the difference
    // domain) → 1-row roll-up. Constant past the first agg at any corpus.
    "hodges_lehmann_shift" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("v"),
            when(expr("int(substring(source, 4, 8))") < 10, 1L).otherwise(0L).as("g1"))
        val grid = g.groupBy("v")
          .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
        val g1 = grid.filter(col("c1") > 0).select(col("v").as("v1"), col("c1"))
        val g2 = grid.filter(col("c2") > 0).select(col("v").as("v2"), col("c2"))
        val dg = g1.crossJoin(broadcast(g2))
          .groupBy((col("v1") - col("v2")).as("d"))
          .agg(sum(big(col("c1")) * big(col("c2"))).as("w"))
        val win = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = grid.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        dg.withColumn("cw", sum(col("w")).over(win))
          .crossJoin(broadcast(tot))
          .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
            min(when(col("cw") * 2 >= big(col("n1")) * big(col("n2")), col("d"))).as("d_lo"),
            min(when(col("cw") * 2 >= big(col("n1")) * big(col("n2")) + 1, col("d"))).as("d_hi"))
          .select(col("n1"), col("n2"),
            expr("cast(cast(n1 as decimal(38,0)) * n2 as double)").as("t_pairs"),
            col("d_lo"), col("d_hi"),
            ((col("d_lo") + col("d_hi")).cast("double") / lit(2.0)).as("hl_shift"))
      },
      oracle = Some(
        """WITH g AS (SELECT n_chars AS v,
          |                  CASE WHEN CAST(substring(source, 4, 8) AS INTEGER) < 10
          |                       THEN 1 ELSE 0 END AS g1
          |           FROM documents),
          |grid AS (SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
          |                CAST(SUM(1 - g1) AS BIGINT) AS c2
          |         FROM g GROUP BY v),
          |dg AS (SELECT a.v - b.v AS d,
          |              SUM(CAST(a.c1 AS HUGEINT) * b.c2) AS w
          |       FROM grid a CROSS JOIN grid b
          |       WHERE a.c1 > 0 AND b.c2 > 0 GROUP BY a.v - b.v),
          |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM grid),
          |cum AS (SELECT d, SUM(w) OVER (ORDER BY d) AS cw FROM dg),
          |m AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
          |             MIN(CASE WHEN cw * 2 >= CAST(n1 AS HUGEINT) * n2 THEN d END) AS d_lo,
          |             MIN(CASE WHEN cw * 2 >= CAST(n1 AS HUGEINT) * n2 + 1 THEN d END) AS d_hi
          |      FROM cum CROSS JOIN tot)
          |SELECT n1, n2, CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) AS t_pairs,
          |       d_lo, d_hi,
          |       CAST(d_lo + d_hi AS DOUBLE) / 2.0 AS hl_shift
          |FROM m""".stripMargin)),

    // ---- Brown-Forsythe (median-Levene) variance-homogeneity test (r12) ---
    // The missing leg of the anova_length_by_source / kruskal triad: are
    // the per-source doc-length VARIANCES equal? ANOVA's F assumes they
    // are; a curation rule tuned on pooled variance is wrong for a source
    // with a fat tail. Brown-Forsythe = one-way ANOVA on z = |x - median|
    // (median, not mean — the robust variant that holds its size under
    // skew, Brown & Forsythe 1974). Exact surface: per-source LOWER
    // median off the per-source cumulative value grid (2*cum >= n, the
    // mad_anomalies convention); z integer; the F pieces ride the micro
    // grid — ssw6 = Σ_i ((n_i·Σz² - (Σz)²)·10⁶) div n_i and ssb6 =
    // Σ_i (n_i·(m6_i - m6)²) div 10⁶ with DECIMAL/HUGEINT widening
    // (n·Σz² ~ n²z², wraps int64 past ~55k-doc strata at z ~ 10³) — so
    // F = (ssb6·(N-k)) / (ssw6·(k-1)) is ONE division of two exact
    // integers, the only float op in the query.
    //
    // Scale shape: one (source, v) grid agg → source-PARTITIONED
    // cumulative windows (value-domain bounded per source) → ≤|sources|
    // median broadcast joined back for the z pass → per-source partial
    // agg → 1-row roll-up. Two scans, both map-side combined.
    "levene_bf_test" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").cast("long").as("v"))
        val grid = docs.groupBy("source", "v").agg(count(lit(1)).as("c"))
        val wsrc = Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val meds = grid.withColumn("cum", sum(col("c")).over(wsrc))
          .join(docs.groupBy("source").agg(count(lit(1)).as("ns")), Seq("source"))
          .groupBy("source")
          .agg(min(when(col("cum") * 2 >= col("ns"), col("v"))).as("med"))
        val z = docs.join(broadcast(meds), Seq("source"))
          .select(col("source"), abs(col("v") - col("med")).as("z"))
        val per = z.groupBy("source")
          .agg(count(lit(1)).as("ni"), sum(col("z")).as("sz"),
            sum(big(col("z")) * big(col("z"))).as("qz"))
          .select(col("source"), col("ni"), col("sz"),
            expr("(cast((ni * qz - cast(sz as decimal(38,0)) * sz) as decimal(38,0)) * 1000000) div ni").as("ssw6"),
            expr("(cast(sz as decimal(38,0)) * 1000000) div ni").as("m6"))
        val tot = per.agg(sum(col("ni")).as("nn"),
          sum(col("sz")).as("szall"), count(lit(1)).as("k"))
        per.crossJoin(broadcast(tot))
          .withColumn("m6all", expr("(cast(szall as decimal(38,0)) * 1000000) div nn"))
          .agg(first(col("k")).as("k"), first(col("nn")).as("n"),
            sum(expr("cast(ssw6 as decimal(38,0))")).as("ssw6d"),
            sum(expr("(cast(ni as decimal(38,0)) * (m6 - m6all) * (m6 - m6all)) div 1000000")).as("ssb6d"))
          .select(col("k"), col("n"),
            expr("cast(ssb6d as bigint)").as("ssb6"),
            expr("cast(ssw6d as bigint)").as("ssw6"),
            when(expr("ssw6d = 0") || col("k") <= 1, lit(null).cast("double"))
              .otherwise(expr("cast(ssb6d * (n - k) as double)")
                / expr("cast(ssw6d * (k - 1) as double)")).as("f_bf"))
      },
      oracle = Some(
        """WITH docs AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents),
          |grid AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
          |         FROM docs GROUP BY source, v),
          |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM docs GROUP BY source),
          |cum AS (SELECT g.source, g.v,
          |               SUM(c) OVER (PARTITION BY g.source ORDER BY g.v) AS cum, ns
          |        FROM grid g JOIN ns ON g.source = ns.source),
          |meds AS (SELECT source, MIN(CASE WHEN cum * 2 >= ns THEN v END) AS med
          |         FROM cum GROUP BY source),
          |z AS (SELECT d.source, abs(v - med) AS z
          |      FROM docs d JOIN meds m ON d.source = m.source),
          |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ni,
          |               CAST(SUM(z) AS BIGINT) AS sz,
          |               SUM(CAST(z AS HUGEINT) * z) AS qz
          |        FROM z GROUP BY source),
          |per2 AS (SELECT source, ni, sz,
          |                ((ni * qz - CAST(sz AS HUGEINT) * sz) * 1000000) // ni AS ssw6,
          |                (CAST(sz AS HUGEINT) * 1000000) // ni AS m6
          |         FROM per),
          |tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS nn, CAST(SUM(sz) AS BIGINT) AS szall,
          |               CAST(COUNT(*) AS BIGINT) AS k
          |        FROM per2),
          |m AS (SELECT k, nn AS n,
          |             SUM(CAST(ssw6 AS HUGEINT)) AS ssw6d,
          |             SUM((CAST(ni AS HUGEINT)
          |                  * (m6 - (CAST(szall AS HUGEINT) * 1000000) // nn)
          |                  * (m6 - (CAST(szall AS HUGEINT) * 1000000) // nn)) // 1000000) AS ssb6d
          |      FROM per2 CROSS JOIN tot GROUP BY k, nn)
          |SELECT k, n, CAST(ssb6d AS BIGINT) AS ssb6, CAST(ssw6d AS BIGINT) AS ssw6,
          |       CASE WHEN ssw6d = 0 OR k <= 1 THEN NULL
          |            ELSE CAST(ssb6d * (n - k) AS DOUBLE)
          |                 / CAST(ssw6d * (k - 1) AS DOUBLE) END AS f_bf
          |FROM m""".stripMargin)),

    // ---- Cohen's d: standardized doc-length difference between groups -----
    // (added r12) Completes the effect-size triad on the shared two-group
    // split (source id < 10 vs rest): cliffs_delta gives ordinal dominance,
    // hodges_lehmann the robust shift in characters, Cohen's d the
    // STANDARDIZED difference the power-analysis and meta-analysis
    // literature quotes (0.2/0.5/0.8 small/medium/large). Exact surface:
    // per-group n/Σx/Σx² are exact ints (DECIMAL-widened squares); the
    // estimate d = (m1 − m2)/s_pooled is a FIXED chain of correctly-
    // rounded double ops on those exact inputs — two mean divisions, the
    // pooled-variance arithmetic, ONE IEEE sqrt (a §5 basic op, the
    // kendall-denominator doctrine), one final division. Degenerate
    // inputs (a group of size < 2, zero pooled variance) report NULL.
    //
    // Scale shape: ONE map-side flag pass → 1-row aggregate. Scan-bound.
    "cohen_d_length" -> Q(
      fn = (s, dir) => {
        val g = Tables.load(s, dir, "documents")
          .select(col("n_chars").cast("long").as("v"),
            when(expr("int(substring(source, 4, 8))") < 10, 1L).otherwise(0L).as("g1"))
        g.agg(
            sum(col("g1")).as("n1"), sum(lit(1L) - col("g1")).as("n2"),
            sum(col("g1") * col("v")).as("s1"),
            sum((lit(1L) - col("g1")) * col("v")).as("s2"),
            sum(expr("cast(g1 * v as decimal(38,0)) * v")).as("q1"),
            sum(expr("cast((1 - g1) * v as decimal(38,0)) * v")).as("q2"))
          .select(col("n1"), col("n2"),
            (col("s1").cast("double") / col("n1").cast("double")).as("mean1"),
            (col("s2").cast("double") / col("n2").cast("double")).as("mean2"),
            when(col("n1") < 2 || col("n2") < 2, lit(null).cast("double"))
              .otherwise(
                ((col("q1").cast("double")
                    - col("s1").cast("double") * col("s1").cast("double")
                      / col("n1").cast("double"))
                  + (col("q2").cast("double")
                    - col("s2").cast("double") * col("s2").cast("double")
                      / col("n2").cast("double")))
                  / (col("n1") + col("n2") - 2).cast("double")).as("var_pooled"))
          .select(col("n1"), col("n2"), col("mean1"), col("mean2"), col("var_pooled"),
            when(col("var_pooled").isNull || col("var_pooled") <= 0.0,
              lit(null).cast("double"))
              .otherwise((col("mean1") - col("mean2")) / sqrt(col("var_pooled")))
              .as("cohen_d"))
      },
      oracle = Some(
        """WITH g AS (SELECT CAST(n_chars AS BIGINT) AS v,
          |                  CASE WHEN CAST(substring(source, 4, 8) AS INTEGER) < 10
          |                       THEN 1 ELSE 0 END AS g1
          |           FROM documents),
          |m AS (SELECT CAST(SUM(g1) AS BIGINT) AS n1,
          |             CAST(SUM(1 - g1) AS BIGINT) AS n2,
          |             CAST(SUM(g1 * v) AS BIGINT) AS s1,
          |             CAST(SUM((1 - g1) * v) AS BIGINT) AS s2,
          |             SUM(CAST(g1 * v AS HUGEINT) * v) AS q1,
          |             SUM(CAST((1 - g1) * v AS HUGEINT) * v) AS q2
          |      FROM g),
          |c AS (SELECT n1, n2,
          |             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
          |             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
          |             CASE WHEN n1 < 2 OR n2 < 2 THEN NULL
          |                  ELSE ((CAST(q1 AS DOUBLE)
          |                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          |                       + (CAST(q2 AS DOUBLE)
          |                         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
          |                       / CAST(n1 + n2 - 2 AS DOUBLE) END AS var_pooled
          |      FROM m)
          |SELECT n1, n2, mean1, mean2, var_pooled,
          |       CASE WHEN var_pooled IS NULL OR var_pooled <= 0.0 THEN NULL
          |            ELSE (mean1 - mean2) / sqrt(var_pooled) END AS cohen_d
          |FROM c""".stripMargin)),

    // ---- permutation entropy of the daily volume series (r12) -------------
    // The ordinal-dynamics complexity measure (Bandt & Pompe 2002, m = 3)
    // beside the TS family's trend/changepoint/burstiness legs: embed the
    // daily total-volume series in consecutive (x_t, x_{t+1}, x_{t+2})
    // triples, map each to its ORDINAL PATTERN (the permutation that
    // sorts it, ties broken by position — the standard convention that
    // keeps patterns well-defined on integer counts), and measure the
    // Shannon entropy of the pattern distribution: ≈ln 6 = maximally
    // unpredictable ordering dynamics, ≈0 = rigid (monotone ramps /
    // strict weekly sawtooth). Pattern ranks are pure integer
    // comparisons; the entropy rides LnGrid — h6 = −Σ c·ln6(c, T) exact
    // int — and h_nats = h6/(T·10⁶) is the ONE bare division.
    //
    // Scale shape: one day-grain hash agg → ONE global lead window over
    // the calendar-bounded series (R2-whitelisted) → ≤27-row pattern agg
    // → 1-row roll-up with a 1-row T broadcast (R1-whitelisted).
    "permutation_entropy" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("d"))
        val tri = daily
          .select(col("d"), col("x"),
            lead(col("x"), 1).over(w).as("x1"), lead(col("x"), 2).over(w).as("x2"))
          .filter(col("x1").isNotNull && col("x2").isNotNull)
        // rank_i = #positions ordered before i under (value, position):
        // j before i iff v_j < v_i, or v_j = v_i and j < i
        val pat = tri.select((
          (when(col("x1") < col("x"), 1).otherwise(0)
            + when(col("x2") < col("x"), 1).otherwise(0)) * 9
            + (when(col("x") <= col("x1"), 1).otherwise(0)
              + when(col("x2") < col("x1"), 1).otherwise(0)) * 3
            + (when(col("x") <= col("x2"), 1).otherwise(0)
              + when(col("x1") <= col("x2"), 1).otherwise(0))).as("pattern"))
        val cnts = pat.groupBy("pattern").agg(count(lit(1)).as("c"))
        val tot = cnts.agg(sum(col("c")).as("t"), count(lit(1)).as("n_patterns"))
        val withT = cnts.crossJoin(broadcast(tot))
        val h = LnGrid.withLn6(withT, col("c"), col("t"), "lct6", "__pe_")
          .agg(first(col("t")).as("t_triples"), first(col("n_patterns")).as("n_patterns"),
            max(struct(col("c"), (-col("pattern")).as("np"))).as("m"),
            (-sum(expr("cast(c as decimal(38,0)) * lct6"))).as("h6d"))
        h.select(col("t_triples"), col("n_patterns"),
            (-col("m.np")).as("top_pattern"), col("m.c").as("top_cnt"),
            expr("cast(h6d as bigint)").as("h6"),
            (col("h6d").cast("double")
              / (col("t_triples") * lit(1000000L)).cast("double")).as("h_nats"))
      },
      oracle = Some(
        s"""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
           |  FROM events GROUP BY CAST(ts AS DATE)),
           |tri0 AS (SELECT d, x,
           |                LEAD(x, 1) OVER (ORDER BY d) AS x1,
           |                LEAD(x, 2) OVER (ORDER BY d) AS x2
           |         FROM daily),
           |tri AS (SELECT * FROM tri0 WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
           |pat AS (SELECT
           |  ((CASE WHEN x1 < x THEN 1 ELSE 0 END)
           |    + (CASE WHEN x2 < x THEN 1 ELSE 0 END)) * 9
           |  + ((CASE WHEN x <= x1 THEN 1 ELSE 0 END)
           |    + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)) * 3
           |  + ((CASE WHEN x <= x2 THEN 1 ELSE 0 END)
           |    + (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END)) AS pattern
           |  FROM tri),
           |cnts AS (SELECT pattern, CAST(COUNT(*) AS BIGINT) AS c FROM pat GROUP BY pattern),
           |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t,
           |               CAST(COUNT(*) AS BIGINT) AS n_patterns FROM cnts),
           |wt AS (SELECT cnts.pattern, cnts.c, tot.t, tot.n_patterns
           |       FROM cnts CROSS JOIN tot),
           |${LnGrid.sqlCtes("wt", "c", "t", "lct6", "pe_")},
           |agg AS (SELECT MAX(t) AS t_triples, MAX(n_patterns) AS n_patterns,
           |               MAX(struct_pack(c := c, np := -pattern)) AS m,
           |               -SUM(CAST(c AS HUGEINT) * lct6) AS h6d
           |        FROM pe_out)
           |SELECT t_triples, n_patterns,
           |       -m.np AS top_pattern, m.c AS top_cnt,
           |       CAST(h6d AS BIGINT) AS h6,
           |       CAST(h6d AS DOUBLE)
           |         / CAST(t_triples * 1000000 AS DOUBLE) AS h_nats
           |FROM agg""".stripMargin)),

    // ---- Granger causality screen: click -> purchase daily volume (r12) ---
    // The causal-screening leg of the time-series family (mann_kendall /
    // theil_sen / changepoint / PH monitor): does yesterday's CLICK volume
    // improve the 1-lag autoregression of today's PURCHASE volume? F-test
    // of the restricted (y ~ y1) vs full (y ~ y1 + x1) OLS over the
    // common-day series (Granger 1969, lag 1). Exactness: the six
    // T-scaled central moments M_ab = T·Σab − Σa·Σb are exact integers
    // (DECIMAL/HUGEINT; documented bound ~1e6 events/day before DECIMAL38
    // would wrap the triple-product determinant); both RSS ratios come
    // from the Schur-complement determinant identity RSS_f = det3/(T·det2),
    // RSS_r = (Myy·M11 − M1y²)/(T·M11), so F = (T−3)·(RSS_r/RSS_f − 1) is
    // a FIXED tree of correctly-rounded double ops on identically-cast
    // exact inputs (the token_budget_plan doctrine — no fold-order
    // ambiguity because every operand is a named scalar). Collinear or
    // degenerate designs (det2/det3 ≤ 0) report NULL. The flag compares
    // against 4.00 — the F(1, 60) α = .05 critical value for this
    // calendar span, a documented constant, not a computed quantile.
    //
    // Scale shape: one day-grain hash agg (map-side combined) → two-series
    // inner join on day → ONE global lag window over the common-day frame
    // (calendar-bounded, R2-whitelisted) → 1-row moment roll-up. Constant
    // past the first agg at any corpus size.
    "granger_daily" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val xs = daily.filter(col("event_type") === "click")
          .select(col("d"), col("n").as("x"))
        val ys = daily.filter(col("event_type") === "purchase")
          .select(col("d"), col("n").as("y"))
        val w = Window.orderBy(col("d"))
        val lagged = xs.join(ys, Seq("d"))
          .select(col("d"), col("y"),
            lag(col("y"), 1).over(w).as("y1"), lag(col("x"), 1).over(w).as("x1"))
          .filter(col("y1").isNotNull && col("x1").isNotNull)
        val mom = lagged.agg(count(lit(1)).as("t"),
          sum(col("y")).as("sy"), sum(col("y1")).as("s1"), sum(col("x1")).as("sx"),
          sum(big(col("y")) * big(col("y"))).as("syy"),
          sum(big(col("y1")) * big(col("y1"))).as("s11"),
          sum(big(col("x1")) * big(col("x1"))).as("sxx"),
          sum(big(col("y1")) * big(col("y"))).as("s1y"),
          sum(big(col("x1")) * big(col("y"))).as("sxy"),
          sum(big(col("y1")) * big(col("x1"))).as("s1x"))
        def m(ab: String, a: String, b: String) =
          (big(col("t")) * col(ab) - big(col(a)) * big(col(b))).cast("double")
        mom
          .select(col("t"),
            m("syy", "sy", "sy").as("myy"), m("s11", "s1", "s1").as("m11"),
            m("sxx", "sx", "sx").as("mxx"), m("s1y", "s1", "sy").as("m1y"),
            m("sxy", "sx", "sy").as("mxy"), m("s1x", "s1", "sx").as("m1x"))
          .withColumn("det2", col("m11") * col("mxx") - col("m1x") * col("m1x"))
          .withColumn("det3",
            col("myy") * col("det2")
              - col("m1y") * (col("m1y") * col("mxx") - col("m1x") * col("mxy"))
              + col("mxy") * (col("m1y") * col("m1x") - col("m11") * col("mxy")))
          .withColumn("nr", col("myy") * col("m11") - col("m1y") * col("m1y"))
          .select(col("t").as("t_obs"),
            col("m11").as("m11"), col("mxx").as("mxx"), col("myy").as("myy"),
            when(col("t") <= 3 || col("det2") <= 0.0 || col("det3") <= 0.0,
              lit(null).cast("double"))
              .otherwise((col("t") - 3).cast("double")
                * (col("nr") * col("det2") / (col("m11") * col("det3")) - 1.0))
              .as("f_granger"))
          .withColumn("causal_flag", coalesce(col("f_granger") > 4.00, lit(false)))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS d, event_type, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events WHERE event_type IN ('click', 'purchase')
          |  GROUP BY CAST(ts AS DATE), event_type),
          |xs AS (SELECT d, n AS x FROM daily WHERE event_type = 'click'),
          |ys AS (SELECT d, n AS y FROM daily WHERE event_type = 'purchase'),
          |lagged0 AS (SELECT xs.d, y,
          |                   LAG(y) OVER (ORDER BY xs.d) AS y1,
          |                   LAG(x) OVER (ORDER BY xs.d) AS x1
          |            FROM xs JOIN ys ON xs.d = ys.d),
          |lagged AS (SELECT * FROM lagged0 WHERE y1 IS NOT NULL AND x1 IS NOT NULL),
          |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
          |               CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y1) AS BIGINT) AS s1,
          |               CAST(SUM(x1) AS BIGINT) AS sx,
          |               SUM(CAST(y AS HUGEINT) * y) AS syy,
          |               SUM(CAST(y1 AS HUGEINT) * y1) AS s11,
          |               SUM(CAST(x1 AS HUGEINT) * x1) AS sxx,
          |               SUM(CAST(y1 AS HUGEINT) * y) AS s1y,
          |               SUM(CAST(x1 AS HUGEINT) * y) AS sxy,
          |               SUM(CAST(y1 AS HUGEINT) * x1) AS s1x
          |        FROM lagged),
          |ms AS (SELECT t,
          |              CAST(CAST(t AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS myy,
          |              CAST(CAST(t AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS m11,
          |              CAST(CAST(t AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS mxx,
          |              CAST(CAST(t AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS DOUBLE) AS m1y,
          |              CAST(CAST(t AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS mxy,
          |              CAST(CAST(t AS HUGEINT) * s1x - CAST(s1 AS HUGEINT) * sx AS DOUBLE) AS m1x
          |       FROM mom),
          |dets AS (SELECT t, myy, m11, mxx, m1y, mxy, m1x,
          |                m11 * mxx - m1x * m1x AS det2,
          |                myy * (m11 * mxx - m1x * m1x)
          |                  - m1y * (m1y * mxx - m1x * mxy)
          |                  + mxy * (m1y * m1x - m11 * mxy) AS det3,
          |                myy * m11 - m1y * m1y AS nr
          |         FROM ms)
          |SELECT t AS t_obs, m11, mxx, myy,
          |       CASE WHEN t <= 3 OR det2 <= 0.0 OR det3 <= 0.0 THEN NULL
          |            ELSE CAST(t - 3 AS DOUBLE)
          |                 * (nr * det2 / (m11 * det3) - 1.0) END AS f_granger,
          |       COALESCE(CASE WHEN t <= 3 OR det2 <= 0.0 OR det3 <= 0.0 THEN NULL
          |            ELSE CAST(t - 3 AS DOUBLE)
          |                 * (nr * det2 / (m11 * det3) - 1.0) END > 4.00, false) AS causal_flag
          |FROM dets""".stripMargin)),

    // ---- Page-Hinkley drift test over daily volume (added r10) ------------
    // The sequential changepoint monitor beside cusum_drift's batch CUSUM:
    // per event type, PH_t = Σ_{i≤t}(x_i − mean_i) against the running
    // minimum — an alarm fires when the excursion PH_t − min_{≤t} exceeds
    // λ (50 events/day here). The prefix mean rides the exact micro grid
    // mean6_i = (S_i·10⁶) div i, so dev6, PH6, and the excursion are all
    // int64 and the alarm comparison is exact (zero float anywhere).
    //
    // Scale shape: one day-grain hash agg; the prefix windows partition by
    // type over the calendar-bounded series (changepoint_daily argument);
    // ≤|types| roll-up.
    "page_hinkley_drift" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lambda6 = 50L * 1000000L
        daily
          .withColumn("t", row_number().over(w).cast("long"))
          .withColumn("s", sum(col("x")).over(cum))
          .withColumn("dev6", col("x") * 1000000L - expr("(s * 1000000L) div t"))
          .withColumn("ph6", sum(col("dev6")).over(cum))
          .withColumn("runmin6", min(col("ph6")).over(cum))
          .withColumn("exc6", col("ph6") - col("runmin6"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            max(col("exc6")).as("max_excursion6"),
            sum(when(col("exc6") > lambda6, 1L).otherwise(0L)).as("n_alarm_days"),
            min(when(col("exc6") > lambda6, col("d"))).as("first_alarm_day"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |c AS (SELECT event_type, d, x,
          |             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS t,
          |             CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS s
          |      FROM daily),
          |dev AS (SELECT *, x * 1000000 - (s * 1000000) // t AS dev6 FROM c),
          |ph AS (SELECT *,
          |              CAST(SUM(dev6) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS ph6
          |       FROM dev),
          |ex AS (SELECT *,
          |              ph6 - CAST(MIN(ph6) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS exc6
          |       FROM ph)
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
          |       CAST(MAX(exc6) AS BIGINT) AS max_excursion6,
          |       CAST(SUM(CASE WHEN exc6 > 50000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
          |       MIN(CASE WHEN exc6 > 50000000 THEN d END) AS first_alarm_day
          |FROM ex GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- decision-stump split: length vs dup label (added r10) ------------
    // The one-feature CART stump: the n_chars threshold minimizing
    // weighted Gini impurity against the dup label (dup_ngram_ratio's
    // df ≥ 2, the shared spelling) — "is document length a usable dedup
    // prior, and where is the cut?" The stump score also IS the feature-
    // usefulness number a curation pipeline ranks features by. Exact
    // surface: per candidate threshold (every grid value except the max),
    // score6 = (cp·(cn−cp)·10⁶) div cn + ((P−cp)·(N−cn−P+cp)·10⁶) div
    // (N−cn) — the N/2-scaled weighted Gini on the micro grid. The
    // numerator products are widened to DECIMAL(38,0) (HUGEINT in the
    // oracle) before the ·10⁶ — cp·(cn−cp) is ~N²/4, which wraps int64
    // once a split side holds ~3M positives (ADVICE r10); the div result
    // IS int64 (≤ N/4·10⁶, safe to N ≈ 3.7e13 docs, documented bound);
    // argmin by min(struct(score6, v)) is deterministic.
    //
    // Scale shape: the label pass is the shared rolling-gram digest plan;
    // one value-grid agg + ONE cumulative window (value-domain bounded,
    // R2-whitelisted) + a 1-row argmin — constant past the label pass.
    "best_split_length_dup" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val tf = docs.withColumn("toks", split(col("text"), " "))
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
        val lab = tf
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"))
        val sc = docs.join(lab, Seq("doc_id"), "left")
          .select(col("n_chars").as("v"), coalesce(col("pos"), lit(0L)).as("pos"))
        val grid = sc.groupBy("v")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
        val win = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = grid.agg(sum(col("n")).as("nn"), sum(col("p")).as("pp"))
        val cand = grid
          .select(col("v"), sum(col("n")).over(win).as("cn"),
            sum(col("p")).over(win).as("cp"))
          .crossJoin(broadcast(tot))
          .filter(col("cn") < col("nn")) // the max value is not a split
          .select(col("v"), col("cn"), col("cp"), col("nn"), col("pp"),
            StatQueries.bestSplitScore6.as("score6"))
        cand.agg(min(struct(col("score6"), col("v"), col("cn"), col("cp"),
            col("nn"), col("pp"))).as("m"))
          .select(col("m.v").as("best_threshold"), col("m.score6").as("gini_score6"),
            col("m.cn").as("n_left"), col("m.cp").as("pos_left"),
            (col("m.nn") - col("m.cn")).as("n_right"),
            (col("m.pp") - col("m.cp")).as("pos_right"),
            (col("m.cp").cast("double") / col("m.cn").cast("double")).as("dup_rate_left"),
            ((col("m.pp") - col("m.cp")).cast("double")
              / (col("m.nn") - col("m.cn")).cast("double")).as("dup_rate_right"))
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |occ AS (SELECT doc_id,
          |               UNNEST(list_transform(range(len(toks) - 4),
          |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
          |        FROM d WHERE len(toks) >= 5),
          |dfx AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh),
          |lab AS (SELECT occ.doc_id, MAX(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS pos
          |        FROM occ JOIN dfx USING (gh) GROUP BY occ.doc_id),
          |sc AS (SELECT n_chars AS v, COALESCE(pos, 0) AS pos
          |       FROM documents LEFT JOIN lab USING (doc_id)),
          |grid AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
          |         FROM sc GROUP BY v),
          |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp FROM grid),
          |cum AS (SELECT v, CAST(SUM(n) OVER (ORDER BY v) AS BIGINT) AS cn,
          |               CAST(SUM(p) OVER (ORDER BY v) AS BIGINT) AS cp
          |        FROM grid),
          |cand AS (SELECT v, cn, cp, nn, pp,
          |                CAST((CAST(cp AS HUGEINT) * (cn - cp) * 1000000) // cn
          |                + (CAST(pp - cp AS HUGEINT) * ((nn - cn) - (pp - cp)) * 1000000)
          |                  // (nn - cn) AS BIGINT) AS score6
          |         FROM cum, tot WHERE cn < nn),
          |best AS (SELECT * FROM cand ORDER BY score6, v LIMIT 1)
          |SELECT v AS best_threshold, score6 AS gini_score6,
          |       cn AS n_left, cp AS pos_left,
          |       nn - cn AS n_right, pp - cp AS pos_right,
          |       CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE) AS dup_rate_left,
          |       CAST(pp - cp AS DOUBLE) / CAST(nn - cn AS DOUBLE) AS dup_rate_right
          |FROM best""".stripMargin)),

    // ---- Cliff's delta: doc length between source groups (added r10) ------
    // The ORDINAL effect size pairing ks_source_lengths' distribution
    // distance: δ = P(x₁ > x₂) − P(x₁ < x₂) over the SAME two-group split
    // (source id < 10 vs rest, the ks spelling verbatim) — KS says the
    // distributions differ, δ says which group's docs are LONGER and by
    // how much dominance (|δ| > 0.474 is Romano's "large"). Computed
    // exactly on the merged value grid: greater-pairs = Σ_v c₁(v)·F₂(v−1)
    // via one cumulative window, never an n₁×n₂ pair join; δ is ONE bare
    // division of exact DECIMAL counts.
    //
    // Scale shape: one value-grid agg; ONE cumulative window over the
    // grid (value-domain bounded, the ks argument, R2-whitelisted);
    // 1-row roll-up.
    "cliffs_delta_length" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("v"),
            when(expr("int(substring(source, 4, 8))") < 10, 1L).otherwise(0L).as("g1"))
        val grid = g.groupBy("v")
          .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
        val tot = grid.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val win = Window.orderBy(col("v"))
        val cum = grid.select(col("v"), col("c1"), col("c2"),
          sum(col("c2")).over(win).as("f2"))
        cum.crossJoin(broadcast(tot))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            sum(big(col("c1")) * big(col("f2") - col("c2"))).as("gt"),
            sum(big(col("c1")) * big(col("n2") - col("f2"))).as("lt"))
          .select(col("n1"), col("n2"),
            // BIGINT, not DECIMAL: gt/lt ≤ n1·n2 < 2⁶³ for any corpus whose
            // pair count fits an int64 (n ≤ ~3e9 per side); r10's driver gate
            // flagged the DECIMAL(38,0) spelling as the registry's only
            // hash-canonicalization mismatch, while BIGINT+DOUBLE rows are
            // hash-stable across all 315 other queries.
            col("gt").cast("long").as("gt_pairs"),
            col("lt").cast("long").as("lt_pairs"),
            when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
              .otherwise((col("gt") - col("lt")).cast("double")
                / (big(col("n1")) * big(col("n2"))).cast("double"))
              .as("cliffs_delta"))
      },
      oracle = Some(
        """WITH g AS (SELECT n_chars AS v,
          |             CASE WHEN CAST(substring(source, 4) AS INT) < 10
          |                  THEN 1 ELSE 0 END AS g1
          |           FROM documents),
          |grid AS (SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
          |                CAST(SUM(1 - g1) AS BIGINT) AS c2
          |         FROM g GROUP BY v),
          |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM grid),
          |cum AS (SELECT v, c1, c2, SUM(c2) OVER (ORDER BY v) AS f2 FROM grid),
          |a AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
          |             SUM(CAST(c1 AS HUGEINT) * (f2 - c2)) AS gt,
          |             SUM(CAST(c1 AS HUGEINT) * (n2 - f2)) AS lt
          |      FROM cum CROSS JOIN tot)
          |SELECT n1, n2,
          |       CAST(gt AS BIGINT) AS gt_pairs,
          |       CAST(lt AS BIGINT) AS lt_pairs,
          |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
          |            ELSE CAST(gt - lt AS DOUBLE)
          |                 / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS cliffs_delta
          |FROM a""".stripMargin)),

    // ---- Mann-Whitney U: doc length between source groups (added r11) -----
    // The RANK-SUM test completing the two-group family: ks_source_lengths
    // (distribution distance), cliffs_delta_length (effect size), and now
    // the significance test — same split (source id < 10 vs rest), same
    // n_chars surface. Computed EXACTLY on the merged value grid: the
    // greater-pair mass gt is cliffs' spelling verbatim, tie mass is one
    // more grid sum, so 2U = 2·gt + ties is exact DECIMAL and the identity
    // δ = (2U − n₁n₂)/(n₁n₂) ties the two queries together (spec-pinned).
    // The tie-corrected normal z uses
    //   4σ² = n₁n₂·((n³−n) − Σ(t³−t)) / (3n(n−1)),
    // every integer exact in DECIMAL(38,0)/HUGEINT (n³ wraps int64 at
    // n ≈ 2e6 — the kendall_tau lesson applied on day one), then ONE
    // fixed chain of correctly-rounded IEEE ops (casts, mult, div, sqrt)
    // for z — bit-identical cross-engine at any corpus size. u2 = 2U is
    // emitted as BIGINT (exact for n₁n₂ < 2⁶² i.e. n ≲ 3e9 per side,
    // documented bound).
    //
    // Scale shape: one value-grid agg; ONE cumulative window over the
    // grid (value-domain bounded, the ks argument, R2-whitelisted);
    // 1-row roll-up.
    "mann_whitney_length" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.load(s, dir, "documents")
          .select(col("n_chars").as("v"),
            when(expr("int(substring(source, 4, 8))") < 10, 1L).otherwise(0L).as("g1"))
        val grid = g.groupBy("v")
          .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
        val win = Window.orderBy(col("v"))
        val cum = grid.select(col("v"), col("c1"), col("c2"),
          sum(col("c2")).over(win).as("f2"))
        cum
          .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
            sum(big(col("c1")) * big(col("f2") - col("c2"))).as("gt"),
            sum(big(col("c1")) * big(col("c2"))).as("ties"),
            sum(big(col("c1") + col("c2")) * big(col("c1") + col("c2"))
              * big(col("c1") + col("c2"))
              - big(col("c1") + col("c2"))).as("tmass"))
          .withColumn("n", col("n1") + col("n2"))
          .withColumn("u2", (big(lit(2)) * col("gt") + col("ties")).cast("long"))
          .withColumn("a", big(col("n1")) * big(col("n2")))
          .withColumn("bterm",
            big(col("n")) * big(col("n")) * big(col("n")) - big(col("n")) - col("tmass"))
          .withColumn("denom",
            sqrt(col("a").cast("double") * col("bterm").cast("double")
              / (lit(3.0d) * col("n").cast("double") * (col("n") - 1).cast("double"))))
          .select(col("n1"), col("n2"), col("u2"),
            when(col("denom") === 0.0d || col("n") < 2, lit(null).cast("double"))
              .otherwise((big(col("u2")) - col("a")).cast("double") / col("denom"))
              .as("z"))
      },
      oracle = Some(
        """WITH g AS (SELECT n_chars AS v,
          |             CASE WHEN CAST(substring(source, 4) AS INT) < 10
          |                  THEN 1 ELSE 0 END AS g1
          |           FROM documents),
          |grid AS (SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
          |                CAST(SUM(1 - g1) AS BIGINT) AS c2
          |         FROM g GROUP BY v),
          |cum AS (SELECT v, c1, c2, SUM(c2) OVER (ORDER BY v) AS f2 FROM grid),
          |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
          |             SUM(CAST(c1 AS HUGEINT) * (f2 - c2)) AS gt,
          |             SUM(CAST(c1 AS HUGEINT) * c2) AS ties,
          |             SUM(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2)
          |                 - (c1 + c2)) AS tmass
          |      FROM cum),
          |m AS (SELECT *, n1 + n2 AS n,
          |             CAST(2 * gt + ties AS BIGINT) AS u2,
          |             CAST(n1 AS HUGEINT) * n2 AS aa,
          |             CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2)
          |               - (n1 + n2) - tmass AS bterm
          |      FROM a),
          |d AS (SELECT *,
          |             sqrt(CAST(aa AS DOUBLE) * CAST(bterm AS DOUBLE)
          |                  / (3.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS denom
          |      FROM m)
          |SELECT n1, n2, u2,
          |       CASE WHEN denom = 0 OR n < 2 THEN NULL
          |            ELSE CAST(CAST(u2 AS HUGEINT) - aa AS DOUBLE) / denom
          |       END AS z
          |FROM d""".stripMargin)),

    // ---- Brier score of the quality score vs the dup label (added r11) ----
    // The PROPER scoring rule completing the calibration family:
    // score_calibration shows WHERE miscalibration lives, auc_dup_quality
    // measures discrimination, the Brier score is the single number that
    // decomposes into both (Murphy 1973): mean (p − y)² of the micro-grid
    // quality score against the df ≥ 2 dup label, per source. Exact
    // surface: Σ(y6 − pos·10⁶)² accumulates in DECIMAL(38,0) (each term
    // ≤ 10¹², the sum wraps int64 at ~9M docs/source), brier is ONE
    // decimal→double division by n·10¹². The label and score passes are
    // score_calibration's verbatim (no-drift discipline).
    //
    // Scale shape: the shared rolling-gram label plan → per-doc map-side
    // scoring → ≤|sources| roll-up.
    "brier_score_dup" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tf = docs.withColumn("toks", split(col("text"), " "))
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
        val lab = tf
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"))
        docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .withColumn("y6",
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long"))
          .join(lab, Seq("doc_id"), "left")
          .withColumn("pos", coalesce(col("pos"), lit(0L)))
          .withColumn("e", col("y6") - col("pos") * 1000000L)
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
            sum(big(col("e")) * big(col("e"))).as("se2"))
          .select(col("source"), col("n"), col("n_pos"),
            (col("se2").cast("double")
              / (big(col("n")) * big(lit(1000000000000L))).cast("double"))
              .as("brier"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks, text
           |           FROM documents),
           |occ AS (SELECT doc_id,
           |               UNNEST(list_transform(range(len(toks) - 4),
           |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
           |        FROM d WHERE len(toks) >= 5),
           |dfx AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh),
           |lab AS (SELECT occ.doc_id, MAX(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS pos
           |        FROM occ JOIN dfx USING (gh) GROUP BY occ.doc_id),
           |sc AS (SELECT source,
           |              CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                   + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                         w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                         AS DOUBLE) / len(toks))
           |                   + 0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 200.0))
           |                   * 1000000.0) AS BIGINT) AS y6,
           |              CAST(COALESCE(pos, 0) AS BIGINT) AS pos
           |       FROM d LEFT JOIN lab USING (doc_id)),
           |e AS (SELECT source, pos, y6 - pos * 1000000 AS e FROM sc)
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           |       CAST(SUM(pos) AS BIGINT) AS n_pos,
           |       CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE)
           |         / CAST(CAST(COUNT(*) AS HUGEINT) * 1000000000000 AS DOUBLE) AS brier
           |FROM e GROUP BY source ORDER BY source""".stripMargin)),

    // ---- SPRT sequential conversion test (added r11) -----------------------
    // Wald's sequential probability ratio test on the daily purchase share —
    // the always-valid sequential monitor an experimentation platform runs
    // INSTEAD of a fixed-horizon test when it wants to stop early:
    // H₀ p = 9/50 vs H₁ p = 11/50 at α = β = 0.05. Per day,
    // ΔLLR = k·ln(p₁/p₀) + (n−k)·ln(q₁/q₀) with k purchases of n events;
    // both log terms are ratios of SMALL INTEGERS (11/9 and 39/41), so the
    // constants come from [[LnGrid.ln6Ref]] evaluated at build time and
    // INLINED AS THE SAME TEXT into both engines (the Ln2_9 one-constant
    // discipline) — the whole path is int64: llr6_t is an exact prefix sum,
    // the ±ln(19)·10⁶ Wald bounds are exact literals, and the decision is
    // pure integer comparison. int64-safe to ~10¹² events/day (k·lA6 ≲
    // 2·10¹⁷/day over a 10⁴-day calendar — documented bound).
    //
    // Scale shape: one day-grain hash agg; ONE calendar-bounded cumulative
    // window (changepoint_daily's R2 argument); 1-row roll-up.
    "sprt_conversion" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lA6 = LnGrid.ln6Ref(11, 9)   // ln(0.22/0.18)·10⁶, positive
        val lB6 = LnGrid.ln6Ref(39, 41)  // ln(0.78/0.82)·10⁶, negative
        val bound6 = LnGrid.ln6Ref(19, 1) // ln((1−β)/α)·10⁶ at α = β = .05
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
        val w = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("llr6",
            sum(col("k") * lit(lA6) + (col("n") - col("k")) * lit(lB6)).over(w))
          .agg(count(lit(1)).as("n_days"),
            sum(col("n")).as("n_events"), sum(col("k")).as("n_purchases"),
            max(col("llr6")).as("max_llr6"), min(col("llr6")).as("min_llr6"),
            min(when(col("llr6") >= bound6, col("d"))).as("h1_cross_day"),
            min(when(col("llr6") <= -bound6, col("d"))).as("h0_cross_day"),
            max(struct(col("d"), col("llr6"))).as("last"))
          .select(col("n_days"), col("n_events"), col("n_purchases"),
            col("last.llr6").as("final_llr6"),
            col("max_llr6"), col("min_llr6"),
            col("h1_cross_day"), col("h0_cross_day"),
            when(col("h1_cross_day").isNotNull &&
                (col("h0_cross_day").isNull
                  || col("h1_cross_day") <= col("h0_cross_day")), "accept_h1")
              .when(col("h0_cross_day").isNotNull, "accept_h0")
              .otherwise("continue").as("decision"))
      },
      oracle = Some {
        val lA6 = LnGrid.ln6Ref(11, 9)
        val lB6 = LnGrid.ln6Ref(39, 41)
        val bound6 = LnGrid.ln6Ref(19, 1)
        s"""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k
           |  FROM events GROUP BY CAST(ts AS DATE)),
           |c AS (SELECT d, n, k,
           |             CAST(SUM(k * ($lA6) + (n - k) * ($lB6)) OVER (ORDER BY d) AS BIGINT) AS llr6
           |      FROM daily),
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           |             CAST(SUM(n) AS BIGINT) AS n_events,
           |             CAST(SUM(k) AS BIGINT) AS n_purchases,
           |             CAST(MAX(llr6) AS BIGINT) AS max_llr6,
           |             CAST(MIN(llr6) AS BIGINT) AS min_llr6,
           |             MIN(CASE WHEN llr6 >= $bound6 THEN d END) AS h1_cross_day,
           |             MIN(CASE WHEN llr6 <= -($bound6) THEN d END) AS h0_cross_day,
           |             CAST(arg_max(llr6, d) AS BIGINT) AS final_llr6
           |      FROM c)
           |SELECT n_days, n_events, n_purchases, final_llr6, max_llr6, min_llr6,
           |       h1_cross_day, h0_cross_day,
           |       CASE WHEN h1_cross_day IS NOT NULL
           |                  AND (h0_cross_day IS NULL OR h1_cross_day <= h0_cross_day)
           |            THEN 'accept_h1'
           |            WHEN h0_cross_day IS NOT NULL THEN 'accept_h0'
           |            ELSE 'continue' END AS decision
           |FROM a""".stripMargin
      }),

    // ---- isotonic calibration of the quality score (added r10) ------------
    // The FIX for what score_calibration DIAGNOSES: the isotonic (PAV)
    // regression of observed dup rate on the score bands — the standard
    // post-hoc calibrator (Zadrozny & Elkan 2002). On the ≤11-row band
    // frame the pool-adjacent-violators solution is the minimax identity
    //   iso(i) = max_{j≤i} min_{k≥i} rate(j..k)
    // computed here on the exact micro grid (rate6(j,k) = (P·10⁶) div N
    // per contiguous band segment) — every comparison is int64, so the
    // fitted curve is bit-identical on any engine; monotonicity is BY
    // CONSTRUCTION (spec pins it and the pooling identity). The label and
    // band passes are score_calibration's verbatim (no-drift discipline).
    //
    // Scale shape: the corpus work is score_calibration's digest plan;
    // everything after the ≤11-row band agg — prefix window, segment
    // self-join (≤66 rows), the i×(j,k) minimax joins — is constant-size.
    "isotonic_calibration" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val tf = docs.withColumn("toks", split(col("text"), " "))
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
        val lab = tf
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
          .groupBy("doc_id")
          .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"))
        val bands = docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("n_stop",
            expr(s"size(filter(toks, t -> t IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))"))
          .withColumn("y",
            floor((lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 50.0) +
              lit(0.3) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) +
              lit(0.3) * least(lit(1.0), length(col("text")).cast("double") / 200.0))
              * 1000000.0).cast("long"))
          .join(lab, Seq("doc_id"), "left")
          .select(expr("y div 100000").as("band"),
            coalesce(col("pos"), lit(0L)).as("pos"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
        val win = Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bands
          .select(col("band"), col("n"), col("p"),
            sum(col("n")).over(win).as("cn"), sum(col("p")).over(win).as("cp"))
        val segs = cum.as("j").join(cum.as("k"), col("j.band") <= col("k.band"))
          .select(col("j.band").as("jb"), col("k.band").as("kb"),
            expr("((k.cp - (j.cp - j.p)) * 1000000L) div (k.cn - (j.cn - j.n))").as("rate6"))
        val mins = segs.join(cum.select(col("band").as("ib")),
            col("jb") <= col("ib") && col("ib") <= col("kb"))
          .groupBy("ib", "jb").agg(min(col("rate6")).as("minr"))
        val iso = mins.groupBy("ib").agg(max(col("minr")).as("iso6"))
        cum.join(iso, col("band") === col("ib"))
          .select(col("band"), col("n"), col("p"),
            expr("(p * 1000000L) div n").as("raw_rate6"), col("iso6"))
          .orderBy("band")
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |occ AS (SELECT doc_id,
           |               UNNEST(list_transform(range(len(toks) - 4),
           |                 i -> md5(array_to_string(toks[i + 1 : i + 5], ' ')))) AS gh
           |        FROM d WHERE len(toks) >= 5),
           |dfx AS (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh),
           |lab AS (SELECT occ.doc_id, MAX(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS pos
           |        FROM occ JOIN dfx USING (gh) GROUP BY occ.doc_id),
           |t AS (SELECT doc_id, string_split(text, ' ') AS toks,
           |             length(text) AS nc FROM documents),
           |q AS (SELECT doc_id,
           |             CAST(floor((0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)
           |                  + 0.3 * (1.0 - CAST(len(list_filter(toks,
           |                        w -> w IN (${TextQueries.stopwords.map(x => s"'$x'").mkString(", ")})))
           |                        AS DOUBLE) / len(toks))
           |                  + 0.3 * least(1.0, CAST(nc AS DOUBLE) / 200.0))
           |                  * 1000000.0) AS BIGINT) AS y
           |      FROM t),
           |bands AS (SELECT y // 100000 AS band, CAST(COUNT(*) AS BIGINT) AS n,
           |                 CAST(SUM(COALESCE(pos, 0)) AS BIGINT) AS p
           |          FROM q LEFT JOIN lab USING (doc_id) GROUP BY y // 100000),
           |cum AS (SELECT band, n, p,
           |               CAST(SUM(n) OVER (ORDER BY band) AS BIGINT) AS cn,
           |               CAST(SUM(p) OVER (ORDER BY band) AS BIGINT) AS cp
           |        FROM bands),
           |segs AS (SELECT j.band AS jb, k.band AS kb,
           |                ((k.cp - (j.cp - j.p)) * 1000000) // (k.cn - (j.cn - j.n)) AS rate6
           |         FROM cum j JOIN cum k ON j.band <= k.band),
           |mins AS (SELECT i.band AS ib, s.jb, MIN(s.rate6) AS minr
           |         FROM segs s JOIN cum i ON s.jb <= i.band AND i.band <= s.kb
           |         GROUP BY i.band, s.jb),
           |iso AS (SELECT ib, CAST(MAX(minr) AS BIGINT) AS iso6 FROM mins GROUP BY ib)
           |SELECT band, n, p, (p * 1000000) // n AS raw_rate6, iso6
           |FROM cum JOIN iso ON cum.band = iso.ib ORDER BY band""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data curation operators beyond dedup (§2.4 north-star surface):
  * benchmark decontamination, deterministic stratified sampling, token-window
  * chunking, and vocabulary statistics — the remaining verbs of a 100 TB
  * LLM-data pipeline, each with an exact DuckDB oracle.
  *
  * Scale shapes: decontamination is explode + shingle equi-join (semi/anti)
  * — never a cross join; sampling is a stateless hash predicate (no shuffle
  * at all until the final count); chunking is a per-row generator; vocab
  * top-k aggregates then TakeOrdered's k rows before the (tiny) rank window.
  */
object CurationQueries {

  /** 5-token distinct shingles (the doc_fingerprint granularity) as the
    * HOF form the DuckDB oracles mirror. Batch queries AND
    * [[graft.streaming.PriorityStreams.decontaminateStream]] both run the
    * native [[graft.functions.ShingleFunctions.shingleSet]] twin (width 5)
    * — still one shared construction, parity-pinned by
    * ShingleFunctionsSpec, so stream and batch provably shingle
    * identically. */
  private[graft] val shingles5 =
    "array_distinct(transform(sequence(0, size(toks) - 5), i -> array_join(slice(toks, i + 1, 5), ' ')))"
  private val shingles5Duck =
    "list_distinct(list_transform(range(len(toks) - 4), i -> array_to_string(toks[i + 1 : i + 5], ' ')))"

  /** decontaminate_bloom's last-built bitmap broadcast — each new build
    * unpersists the previous one so repeated invocations hold at most one
    * live ~1 MB broadcast per session instead of leaking them. */
  private val lastBloomBcast =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.broadcast.Broadcast[Array[Byte]]](null)

  val all: Map[String, Q] = Map(

    // ---- benchmark decontamination --------------------------------------
    // The held-out "benchmark" set is synthetic (doc_id % 97 == 0); a corpus
    // doc is contaminated iff it shares ANY 5-token shingle with a benchmark
    // doc. Candidate generation is an equi-join on the shingle itself
    // (explode → semi-join → distinct) — at 100 TB the benchmark shingle set
    // is small and broadcastable, so the corpus side never shuffles.
    "decontaminate" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sh = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions.shingleSet(col("toks"), 5)).as("s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
        val cont = sh.filter(col("doc_id") % 97 =!= 0)
          .join(bench, Seq("s"), "left_semi")
          .select("doc_id").distinct()
        docs.filter(col("doc_id") % 97 =!= 0)
          .join(cont.withColumn("contaminated", lit(1)), Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("contaminated").isNotNull, 1).otherwise(0)).as("n_contaminated"),
            sum(when(col("contaminated").isNull, 1).otherwise(0)).as("n_kept"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id, UNNEST($shingles5Duck) AS s FROM t WHERE len(toks) >= 5),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
           |cont AS (SELECT DISTINCT doc_id FROM sh
           |         WHERE doc_id % 97 != 0 AND s IN (SELECT s FROM bench))
           |SELECT d.source, COUNT(*) AS n_docs,
           |       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           |       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
           |WHERE d.doc_id % 97 != 0
           |GROUP BY d.source ORDER BY d.source""".stripMargin),
      headline = true),

    // ---- bloom-prefiltered decontamination (added r7) --------------------
    // The 100 TB execution shape of `decontaminate`, result-identical by
    // construction: the benchmark shingle set is aggregated into a bloom
    // filter (1-row binary, broadcast — Spark's internal runtime-filter
    // expressions surfaced via functions/BloomFunctions), the corpus
    // shingle stream drops definite non-members MAP-SIDE (a bloom has no
    // false negatives, so no true match can be lost), and only the ~fpp
    // surviving sliver reaches the exact semi-join that kills false
    // positives. The exact plan must move corpus shingles into the join;
    // this one moves candidates only. Output contract == decontaminate —
    // the oracle IS decontaminate's SQL, which is the point: a DuckDB
    // oracle for "engine-side pushdown that provably doesn't change the
    // answer".
    //
    // Honest cost note (measured sf0.1): 1.5 s vs the exact plan's 1.0 s —
    // at gate scale the benchmark side broadcasts anyway, so the bloom
    // build is pure overhead. The shape wins when the reference set is too
    // big to broadcast (the exact plan then shuffles BOTH full shingle
    // streams; this one shuffles bench + the ~fpp candidate sliver) —
    // that crossover, not today's numbers, is why the operator exists.
    "decontaminate_bloom" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sh = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions.shingleSet(col("toks"), 5)).as("s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
        val bloom = bench.agg(
          graft.functions.BloomFunctions
            .bloomFilterAgg(xxhash64(col("s")), 1000000L).as("bf"))
        // The filter ships as a Broadcast HANDLE, not a plan literal: the
        // r7 scalar-subquery form embedded the full bitmap in every
        // downstream task binary (2.5-3.7 MiB × 8 stages — the registry's
        // only large-task-binary warnings; r10 verdict item). head() here
        // is the same driver-side evaluation ScalarSubquery performed —
        // ONE binary cell — and the bitmap now rides the torrent protocol
        // once per executor like a broadcast join relation.
        //
        // FN CONTRACT NOTE: that head() makes this registry fn EAGER —
        // building the frame runs the bloom aggregation (plan-only
        // consumers pay it too). Accepted: the bitmap must exist before
        // the downstream plan can be constructed, exactly like a
        // broadcast-join relation materializing at planning time.
        val bfBytes = bloom.head().getAs[Array[Byte]](0)
        // an empty bench sliver aggregates to a null cell — there is
        // nothing to prefilter against, and shipping null would NPE in
        // BloomFilter.readFrom on executors. cont is definitionally empty
        // (no benchmark shingles → no contamination), so skip the bloom
        // leg entirely and keep the exact (empty) semi-join.
        val cont =
          if (bfBytes == null) {
            sh.filter(col("doc_id") % 97 =!= 0)
              .join(bench, Seq("s"), "left_semi")
              .select("doc_id").distinct()
          } else {
            val bfBcast = s.sparkContext.broadcast(bfBytes)
            // at most ONE live bitmap broadcast per session: unpersist the
            // previous invocation's executor copies (unpersist, not
            // destroy — an older frame re-executing just re-fetches from
            // the driver) instead of leaking ~1 MB per build for the
            // session lifetime.
            val prev = lastBloomBcast.getAndSet(bfBcast)
            if (prev != null) prev.unpersist(blocking = false)
            sh.filter(col("doc_id") % 97 =!= 0)
              .filter(graft.functions.BloomFunctions.mightContainBroadcast(
                bfBcast, xxhash64(col("s"))))
              .join(bench, Seq("s"), "left_semi") // exact verify on the sliver
              .select("doc_id").distinct()
          }
        docs.filter(col("doc_id") % 97 =!= 0)
          .join(cont.withColumn("contaminated", lit(1)), Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("contaminated").isNotNull, 1).otherwise(0)).as("n_contaminated"),
            sum(when(col("contaminated").isNull, 1).otherwise(0)).as("n_kept"))
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id, UNNEST($shingles5Duck) AS s FROM t WHERE len(toks) >= 5),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
           |cont AS (SELECT DISTINCT doc_id FROM sh
           |         WHERE doc_id % 97 != 0 AND s IN (SELECT s FROM bench))
           |SELECT d.source, COUNT(*) AS n_docs,
           |       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           |       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
           |WHERE d.doc_id % 97 != 0
           |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ---- per-document contamination score (added r6) ---------------------
    // The scored refinement of `decontaminate`'s binary verdict: what
    // FRACTION of a doc's distinct 5-token shingles appear in the held-out
    // benchmark set? Pipelines threshold this (e.g. drop > 10% overlap,
    // audit 1-10%) rather than hard-dropping on a single shared shingle.
    // Scale shape identical to decontaminate: one corpus shingle pass, the
    // benchmark side is small and broadcastable, per-doc agg carries two
    // ints; the ratio is exact-int division cast to double.
    "contamination_score" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // per-doc DISTINCT shingles (the score denominator) deduped
        // MAP-SIDE via array_distinct BEFORE the explode — a post-explode
        // .distinct() computes the same rows through a corpus-wide shuffle
        // (measured ~25% of the query at sf0.1); after this the
        // (doc_id, s) rows are unique by construction
        val sh = docs
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions.shingleSet(col("toks"), 5)).as("s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
        sh.filter(col("doc_id") % 97 =!= 0)
          .join(bench.withColumn("hit", lit(1)), Seq("s"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_shingles"),
            sum(when(col("hit").isNotNull, 1).otherwise(0)).as("n_overlap"))
          .withColumn("score",
            Q.grid6(col("n_overlap").cast("double") / col("n_shingles")))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT DISTINCT doc_id, s FROM (
           |         SELECT doc_id, UNNEST($shingles5Duck) AS s FROM t WHERE len(toks) >= 5)),
           |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
           |SELECT doc_id, COUNT(*) AS n_shingles,
           |       CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           |       floor(CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |             / COUNT(*) * 1000000.0) / 1000000.0 AS score
           |FROM sh LEFT JOIN bench b USING (s)
           |WHERE doc_id % 97 != 0
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- domain mixture weights (added r6) -------------------------------
    // The sampling-weight half of multi-source training-mix design
    // (`sample_temperature` is the per-row EXECUTION half): per-source
    // token shares p_s and temperature-flattened mixture weights
    // w_s = √p_s / Σ√p_t (α = 0.5). ENGINE-VERSION-PROOF (r8 doctrine,
    // Queries.scala): r7's round(sqrt(share), 6) grid matched the local
    // DuckDB bitwise yet hash-failed the driver's build — libm sqrt +
    // round(double, 6) are not portable ACROSS BUILDS, so neither may
    // reach a hashed byte. Now √p_s is [[Q.isqrt]] over the exact integer
    // share grid share10 = (n_s·10^10) div T (pure int64 floor division;
    // exact for n_s ≤ 9.2e8 — beyond that widen the product to
    // DECIMAL(38,0) on both engines), w5 = ⌊√share10⌋ ≤ 10^5 exact int,
    // the normalizer Σw5 an exact order-independent int sum, and each
    // emitted double is ONE bare IEEE division of exact ints. Scale
    // shape: one corpus pass, 1-row total and the per-source weight
    // table broadcast — the corpus is never shuffled.
    "mix_weights" -> Q(
      fn = (s, dir) => {
        val tok = Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).as("n_tokens"))
        val tot = tok.agg(sum(col("n_tokens")).as("t_total"))
        val withW = tok.crossJoin(broadcast(tot))
          .withColumn("share10", expr("(n_tokens * 10000000000) div t_total"))
          .withColumn("w5", Q.isqrt(col("share10")))
        val wsum = withW.agg(sum(col("w5")).as("wsum"))
        withW.crossJoin(broadcast(wsum))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("n_tokens").cast("double") / col("t_total")).as("share"),
            (col("w5").cast("double") / col("wsum").cast("double")).as("weight"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH tok AS (SELECT source, COUNT(*) AS n_docs,
          |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          |            FROM documents GROUP BY source),
          |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total FROM tok),
          |g AS (SELECT source, n_docs, n_tokens, t_total,
          |             (n_tokens * 10000000000) // t_total AS share10
          |      FROM tok, tot),
          |s0 AS (SELECT g.*, CAST(floor(sqrt(CAST(share10 AS DOUBLE))) AS BIGINT) AS c0 FROM g),
          |w AS (SELECT source, n_docs, n_tokens, t_total, share10,
          |             CASE WHEN (c0 + 1) * (c0 + 1) <= share10 THEN c0 + 1
          |                  WHEN c0 * c0 > share10 THEN c0 - 1 ELSE c0 END AS w5
          |      FROM s0),
          |ws AS (SELECT CAST(SUM(w5) AS BIGINT) AS wsum FROM w)
          |SELECT source, n_docs, n_tokens,
          |       CAST(n_tokens AS DOUBLE) / t_total AS share,
          |       CAST(w5 AS DOUBLE) / CAST(wsum AS DOUBLE) AS weight
          |FROM w, ws ORDER BY source""".stripMargin)),

    // ---- greedy argmax decode from the bigram LM (added r8) --------------
    // The deterministic end of the LM family: starting from the corpus's
    // most frequent token, repeatedly follow the highest-count bigram
    // transition for 6 steps — greedy argmax decoding, the temperature-0
    // generation every LM eval harness smoke-tests with, and a direct
    // probe of what the bigram statistics "memorized" (the decode IS the
    // corpus's dominant phrase skeleton). All-integer argmax (count DESC,
    // token ASC tie-break) so both engines pick identical paths; emitted
    // columns are the step, token, and the exact transition count taken.
    // A step with no outgoing bigram ends the walk (shorter output, same
    // on both engines).
    //
    // Scale shape: ONE corpus bigram agg; each unrolled step is a 1-row
    // broadcast joined against the vocab-sized model — the kcenter loop
    // shape with constant-size state.
    "bigram_greedy_decode" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
        // r16: the lazy model/start subtrees nested into every unrolled
        // step's plan (step k's 1-row argmax references step k−1's whole
        // plan, which references the model again) — the final plan carried
        // 56 corpus-scan subtrees of which runtime exchange reuse deduped
        // only a third (ReuseCheck: 30 executed scans, 11 reused). The
        // model (vocab²-bounded) and the 1-row start are each ONE corpus
        // aggregate — materialize both once, their jobs overlapped (§2.6);
        // the decode chain then runs over checkpointed frames only: two
        // corpus passes total at any scale.
        val Seq(model, start) = Q.truncatePar(Seq(
          toks.filter(size(col("toks")) >= 2)
            .select(explode(expr(
              """transform(sequence(0, size(toks) - 2),
                |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
                .stripMargin)).as("e"))
            .select(col("e.a").as("a"), col("e.b").as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("c")),
          toks.select(explode(col("toks")).as("t"))
            .groupBy("t").agg(count(lit(1)).as("c"))
            .agg(min(struct(negate(col("c")).as("nc"), col("t").as("t"))).as("m"))
            .select(lit(0L).as("step"), col("m.t").as("token"),
              negate(col("m.nc")).as("c"))))
        var out = start
        var cur = start
        for (k <- 1 to 6) {
          cur = model.join(broadcast(cur.select(col("token").as("a"))), Seq("a"))
            .agg(min(struct(negate(col("c")).as("nc"), col("b").as("b"))).as("m"))
            .select(lit(k.toLong).as("step"), col("m.b").as("token"),
              negate(col("m.nc")).as("c"))
            .filter(col("token").isNotNull)
          out = out.unionByName(cur)
        }
        out.orderBy("step")
      },
      oracle = Some {
        val steps = (1 to 6).map { k =>
          s"""s$k AS (SELECT a, b, c FROM model
             |       WHERE a = (SELECT token FROM p${k - 1})
             |       ORDER BY c DESC, b LIMIT 1),
             |p$k AS (SELECT CAST($k AS BIGINT) AS step, b AS token, c FROM s$k)"""
            .stripMargin
        }.mkString(",\n")
        val union = (1 to 6).map(k => s"UNION ALL SELECT * FROM p$k").mkString("\n")
        s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
           |model AS (SELECT toks[i] AS a, toks[i + 1] AS b,
           |                 CAST(COUNT(*) AS BIGINT) AS c
           |          FROM t, UNNEST(range(1, len(toks))) AS u(i)
           |          WHERE len(toks) >= 2 GROUP BY 1, 2),
           |uni AS (SELECT unnest(toks) AS tk FROM t),
           |p0 AS (SELECT CAST(0 AS BIGINT) AS step, tk AS token,
           |              CAST(COUNT(*) AS BIGINT) AS c
           |       FROM uni GROUP BY tk ORDER BY c DESC, tk LIMIT 1),
           |$steps
           |SELECT * FROM p0
           |$union
           |ORDER BY step""".stripMargin
      }),

    // ---- word2vec negative-sampling table (added r8) ---------------------
    // The unigram^¾ sampling distribution word2vec/NCE training draws
    // negatives from (Mikolov et al. 2013): raising counts to the ¾ power
    // flattens the head so frequent tokens stop dominating the negative
    // pool. ENGINE-VERSION-PROOF ¾ power with NO pow/exp: c^¾ = √(c·√c),
    // computed as the nested floor-sqrt isqrt(c·isqrt(c)) — [[Q.isqrt]]'s
    // ±1 integer repair makes each floor exact on any engine, and the
    // composition is therefore a pure integer function of c (NOT exactly
    // ⌊c^0.75⌋ — the inner floor loses < 1 — but a DETERMINISTIC,
    // monotone, ¾-power-equivalent weight, which is all the sampler
    // needs). Weight mass Σw runs over the FULL vocabulary; the emitted
    // top-30 carry exact int weights and ONE bare division each. At
    // 100 TB counts (~1e13), c·isqrt(c) exceeds int64 — widen the product
    // to DECIMAL(38,0) (token_burstiness discipline); construction
    // unchanged.
    //
    // Scale shape: one vocab agg → 1-row weight-sum broadcast →
    // TakeOrderedAndProject(30); nothing corpus-sized past the vocab agg.
    "negsample_table" -> Q(
      fn = (s, dir) => {
        val vocab = Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
          .withColumn("w34", Q.isqrt(col("c") * Q.isqrt(col("c"))))
        val wsum = vocab.agg(sum(col("w34")).as("wsum"), count(lit(1)).as("v"))
        vocab.crossJoin(broadcast(wsum))
          .orderBy(col("c").desc, col("t")).limit(30)
          .select(col("t"), col("c"), col("w34"), col("v").as("vocab_size"),
            (col("w34").cast("double") / col("wsum").cast("double")).as("p_neg"))
      },
      oracle = Some(
        """WITH vocab AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          |               FROM (SELECT unnest(string_split(text, ' ')) AS t
          |                     FROM documents) GROUP BY t),
          |i1 AS (SELECT t, c, CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s0
          |       FROM vocab),
          |r1 AS (SELECT t, c,
          |              CASE WHEN (s0 + 1) * (s0 + 1) <= c THEN s0 + 1
          |                   WHEN s0 * s0 > c THEN s0 - 1 ELSE s0 END AS sc
          |       FROM i1),
          |i2 AS (SELECT t, c, c * sc AS x,
          |              CAST(floor(sqrt(CAST(c * sc AS DOUBLE))) AS BIGINT) AS s0
          |       FROM r1),
          |r2 AS (SELECT t, c,
          |              CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
          |                   WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS w34
          |       FROM i2),
          |ws AS (SELECT CAST(SUM(w34) AS BIGINT) AS wsum,
          |              CAST(COUNT(*) AS BIGINT) AS v FROM r2)
          |SELECT t, c, w34, ws.v AS vocab_size,
          |       CAST(w34 AS DOUBLE) / CAST(ws.wsum AS DOUBLE) AS p_neg
          |FROM r2, ws ORDER BY c DESC, t LIMIT 30""".stripMargin)),

    // ---- deterministic stratified sampling ------------------------------
    // Per-source Bernoulli rates (src0-4: 100%, src5-9: 50%, src10-14: 25%,
    // src15-19: 10%) decided by the first 4 hex chars of md5(doc_id) against
    // a string threshold — reproducible on any engine, no RNG state, no
    // shuffle before the accounting agg. ('g' compares above every hex char,
    // so it is the always-keep threshold.)
    "sample_stratified" -> Q(
      fn = (s, dir) => {
        val grp = expr("int(substring(source, 4, 8)) div 5")
        val threshold = when(grp === 0, "g").when(grp === 1, "8000")
          .when(grp === 2, "4000").otherwise("199a")
        Tables.load(s, dir, "documents")
          .withColumn("keep",
            substring(md5(col("doc_id").cast("string")), 1, 4) < threshold)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1).otherwise(0)).as("n_sampled"))
          .orderBy("source")
      },
      oracle = Some(
        """SELECT source, COUNT(*) AS n_total,
          |       CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          |         (CASE CAST(substring(source, 4) AS INT) // 5
          |               WHEN 0 THEN 'g' WHEN 1 THEN '8000'
          |               WHEN 2 THEN '4000' ELSE '199a' END)
          |         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
          |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- temperature-based source rebalancing (added r5) -----------------
    // Multilingual/multi-source training mixes downsample dominant sources
    // toward uniform with a temperature: keep rate k_s = (N_min/N_s)^(1-α),
    // here α = 0.5 ⇒ k_s = sqrt(N_min/N_s) — the smallest source keeps
    // everything, a 100× larger source keeps 10%. Deterministic per-row
    // Bernoulli: u = (doc_id · 2654435761) mod 2³² (Knuth multiplicative
    // hash) kept iff u < floor(k_s · 2³²). The product is computed via a
    // 16-bit SPLIT of a = doc_id mod 2³² (a·b mod 2³² =
    // (a₀·b + (a₁·b mod 2¹⁶)·2¹⁶) mod 2³², a = a₁·2¹⁶ + a₀): a naive
    // doc_id · 2654435761 overflows int64 at doc_id ≳ 3.47e9 — Spark
    // (non-ANSI) wraps silently where DuckDB raises, exactly at the
    // 100 TB doc counts this query targets — and even pre-reducing
    // mod 2³² leaves a (2³²−1)·b ≈ 1.14e19 > Long.Max product. With the
    // split every intermediate is < 1.8e14: identical bits on any engine,
    // for ALL int64 doc_ids. Float discipline: the only float ops are one
    // division and one sqrt (both IEEE correctly-rounded ⇒ bit-identical
    // cross-engine; no libm pow anywhere), then an exact floor to int64.
    // Scale shape: the per-source count agg is tiny and broadcast back; the
    // corpus side is a stateless predicate — no shuffle at 100 TB beyond
    // the final accounting agg.
    "sample_temperature" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
        val mn = counts.agg(min(col("n_src")).as("n_min"))
        val rates = counts.crossJoin(broadcast(mn))
          .withColumn("keep_rate", sqrt(col("n_min").cast("double") / col("n_src")))
          .withColumn("cut", floor(col("keep_rate") * lit(4294967296.0)).cast("long"))
          .select("source", "keep_rate", "cut")
        val a = pmod(col("doc_id"), lit(4294967296L))
        val knuthU = pmod(
          pmod(a, lit(65536L)) * lit(2654435761L) +
            pmod(shiftright(a, 16) * lit(2654435761L), lit(65536L)) * lit(65536L),
          lit(4294967296L))
        docs.select(col("source"), knuthU.as("u"))
          .join(broadcast(rates), Seq("source"))
          .groupBy("source", "keep_rate")
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("u") < col("cut"), 1).otherwise(0)).as("n_kept"))
          .select(col("source"), col("n_total"), col("n_kept"),
            Q.grid6(col("keep_rate")).as("keep_rate"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
          |m AS (SELECT MIN(n_src) AS n_min FROM c),
          |r AS (SELECT source, sqrt(CAST(n_min AS DOUBLE) / n_src) AS keep_rate,
          |             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_src) * 4294967296.0) AS BIGINT) AS cut
          |      FROM c, m),
          |a AS (SELECT source, doc_id,
          |             ((doc_id % 4294967296) + 4294967296) % 4294967296 AS am
          |      FROM documents),
          |u AS (SELECT source,
          |             ((am % 65536) * 2654435761
          |              + ((am // 65536) * 2654435761 % 65536) * 65536) % 4294967296 AS u
          |      FROM a)
          |SELECT d.source, COUNT(*) AS n_total,
          |       CAST(SUM(CASE WHEN d.u < r.cut
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |       floor(r.keep_rate * 1000000.0) / 1000000.0 AS keep_rate
          |FROM u d JOIN r ON d.source = r.source
          |GROUP BY d.source, r.keep_rate ORDER BY d.source""".stripMargin)),

    // ---- per-document TF-IDF key terms (added r5) ------------------------
    // Top-3 characteristic terms per document: score = tf · ln(N/df) — the
    // classic keyword-extraction / relevance primitive. Scale shape: tf is
    // one (doc, term) hash agg; df FALLS OUT of tf (count of its rows per
    // term — no second pass over the corpus); the vocab-sized idf table
    // broadcasts back onto tf; the final top-k is a per-doc window over ≤
    // |doc vocab| rows. ENGINE-VERSION-PROOF (r8): idf comes from
    // [[LnGrid]]'s fixed-point integer chain; tf·idf6 ranking keys are
    // exact int64, the emitted score is one bare division by 10^6.
    // ---- log-odds keyness: distinctive terms per source (added r8) -------
    // Monroe/Colaresi/Quinn's "Fightin' Words" log-odds-ratio — the
    // principled keyness measure tfidf_topterms approximates: for each
    // (source, token), ln of the token's smoothed odds INSIDE the source
    // minus its smoothed odds in the REST of the corpus. Unlike tf-idf it
    // is symmetric, rate-based (not doc-count-based), and penalizes tokens
    // common everywhere. Add-one smoothing (integer-friendly Haldane
    // variant) keeps every operand a positive int64, so both ln terms ride
    // the LnGrid chain; keyness6 is an exact int difference, the emitted
    // double ONE bare division by 10⁶. Top-3 per source by (keyness6 DESC,
    // tok) — deterministic.
    //
    // Scale shape: one (source, tok) agg; the rest-of-corpus counts come
    // from a vocab-keyed join against the token totals (vocab-sized, never
    // corpus rows); per-source totals and the grand total broadcast; the
    // rank window PARTITIONS by source over the vocab-bounded frame.
    "log_odds_keyness" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val st = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("cs"))
        val tokTot = st.groupBy("tok").agg(sum(col("cs")).as("ct"))
        val srcTot = st.groupBy("source").agg(sum(col("cs")).as("ns"))
        val grand = tokTot.agg(sum(col("ct")).as("nt"))
        val j = st.join(tokTot, Seq("tok"))
          .join(broadcast(srcTot), Seq("source"))
          .crossJoin(broadcast(grand))
          .withColumn("cr", col("ct") - col("cs"))
          .withColumn("nr", col("nt") - col("ns"))
        val l1 = LnGrid.withLn6(j, col("cs") + 1, col("ns") - col("cs") + 1,
          "lo_in6", "__ki_")
        val l2 = LnGrid.withLn6(l1, col("cr") + 1, col("nr") - col("cr") + 1,
          "lo_out6", "__ko_")
        val scored = l2.withColumn("keyness6", col("lo_in6") - col("lo_out6"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("keyness6").desc, col("tok"))
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("source"), col("tok"), col("cs").as("c_src"),
            col("cr").as("c_rest"), col("keyness6"),
            (col("keyness6").cast("double") / 1000000.0).as("keyness"))
          .orderBy("source", "keyness6", "tok")
      },
      oracle = Some(
        s"""WITH st0 AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           |             FROM documents),
           |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cs
           |       FROM st0 GROUP BY source, tok),
           |tt AS (SELECT tok, CAST(SUM(cs) AS BIGINT) AS ct FROM st GROUP BY tok),
           |sc AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM st GROUP BY source),
           |g AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM tt),
           |j AS (SELECT st.source, st.tok, st.cs, tt.ct - st.cs AS cr,
           |             sc.ns, g.nt - sc.ns AS nr
           |      FROM st JOIN tt USING (tok) JOIN sc USING (source), g),
           |${LnGrid.sqlCtes("j", "cs + 1", "ns - cs + 1", "lo_in6", "__ki_")},
           |${LnGrid.sqlCtes("__ki_out", "cr + 1", "nr - cr + 1", "lo_out6", "__ko_")},
           |scored AS (SELECT source, tok, cs, cr, lo_in6 - lo_out6 AS keyness6
           |           FROM __ko_out),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
           |                ORDER BY keyness6 DESC, tok) AS rk FROM scored)
           |SELECT source, tok, cs AS c_src, cr AS c_rest, keyness6,
           |       CAST(keyness6 AS DOUBLE) / 1000000.0 AS keyness
           |FROM r WHERE rk <= 3
           |ORDER BY source, keyness6, tok""".stripMargin)),

    "tfidf_topterms" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        val idf = LnGrid.withLn6(
            tf.groupBy("term").agg(count(lit(1)).as("df")).crossJoin(broadcast(nd)),
            col("n_docs"), col("df"), "idf6")
          .select(col("term"), col("idf6"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score6").desc, col("term"))
        // no broadcast HINT on idf: it is vocabulary-sized, not constant-
        // sized — size-based join selection broadcasts it at any realistic
        // vocab and falls back to a shuffle join on term if the vocab ever
        // outgrows the threshold (a forced hint would OOM the driver there)
        tf.join(idf, Seq("term"))
          .withColumn("score6", col("tf") * col("idf6"))
          .withColumn("rank", row_number().over(w).cast("int"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("term"),
            (col("score6").cast("double") / lit(1000000.0d)).as("score"), col("rank"))
          .orderBy("doc_id", "rank")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
           |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
           |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
           |dfj AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, n_docs
           |        FROM tf, nd GROUP BY term, n_docs),
           |${LnGrid.sqlCtes("dfj", "n_docs", "df", "idf6", "tfi_")},
           |scored AS (
           |  SELECT doc_id, tf.term, tf * idf6 AS score6
           |  FROM tf JOIN tfi_out idf ON tf.term = idf.term),
           |ranked AS (
           |  SELECT doc_id, term, CAST(score6 AS DOUBLE) / 1000000.0 AS score,
           |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score6 DESC, term) AS rank
           |  FROM scored)
          |SELECT doc_id, term, score, CAST(rank AS INTEGER) AS rank
          |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- token-window chunking ------------------------------------------
    // 50-token windows at stride 40 (10-token overlap) — the standard
    // pretraining chunker. Pure per-row generator: parallelism-preserving,
    // no shuffle until the final sort; chunk identity is the md5 of the
    // joined window so downstream exact-dedup composes directly.
    "chunk_documents" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"),
            explode(expr("sequence(0, (size(toks) - 1) div 40)")).as("i"),
            col("toks"))
          .select(
            col("doc_id"),
            col("i").cast("int").as("chunk_idx"),
            expr("size(slice(toks, int(i * 40 + 1), 50))").as("n_chunk_tokens"),
            expr("md5(array_join(slice(toks, int(i * 40 + 1), 50), ' '))").as("chunk_hash"))
          .orderBy("doc_id", "chunk_idx")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |c AS (SELECT doc_id, UNNEST(range((len(toks) - 1) // 40 + 1)) AS i, toks FROM t)
          |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
          |       CAST(len(toks[i * 40 + 1 : i * 40 + 50]) AS INTEGER) AS n_chunk_tokens,
          |       md5(array_to_string(toks[i * 40 + 1 : i * 40 + 50], ' ')) AS chunk_hash
          |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- cross-document chunk overlap (added r5) -------------------------
    // Exact-substring dedup at chunk granularity (the tractable 100 TB
    // stand-in for suffix-array substring dedup, Lee et al. 2022): a doc's
    // overlap rate = fraction of its 50-token chunks whose hash appears in
    // ≥ 2 DISTINCT documents.
    //
    // Scale shape (r16, guide §2.4 "share one exchange"): the shared-chunk
    // test `COUNT(DISTINCT doc_id) ≥ 2` is exactly `min(doc_id) ≠
    // max(doc_id)` over the chunk_hash partition, so it now runs as a
    // WINDOW over the ONE chunk_hash exchange instead of a distinct-agg
    // plus an equi-join back — the old plan computed the corpus
    // chunk-explode + md5 TWICE (once per join side) and paid two
    // corpus-sized exchanges on the same key; the new plan explodes once,
    // exchanges once, then rolls up per doc and per source. The oracle
    // keeps the COUNT(DISTINCT) spelling — same verdict per row by
    // construction.
    "dedup_chunk_overlap" -> Q(
      fn = (s, dir) => {
        val chunks = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), col("source"),
            explode(expr("sequence(0, (size(toks) - 1) div 40)")).as("i"),
            col("toks"))
          .select(col("doc_id"), col("source"),
            expr("md5(array_join(slice(toks, int(i * 40 + 1), 50), ' '))").as("chunk_hash"))
        val wch = org.apache.spark.sql.expressions.Window.partitionBy("chunk_hash")
        val perDoc = chunks
          .withColumn("shared",
            min(col("doc_id")).over(wch) =!= max(col("doc_id")).over(wch))
          .groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("shared"), 1).otherwise(0)).as("n_shared"))
          .withColumn("rate",
            Q.grid6(col("n_shared").cast("double") / col("n_chunks")))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("rate") > 0.5, 1).otherwise(0)).as("n_flagged"),
            Q.grid6(sum(col("rate").cast("decimal(10,6)")).cast("double") / count(lit(1)))
              .as("avg_overlap"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
          |ch AS (SELECT doc_id, source,
          |         md5(array_to_string(toks[i * 40 + 1 : i * 40 + 50], ' ')) AS chunk_hash
          |       FROM (SELECT doc_id, source, toks,
          |               UNNEST(range((len(toks) - 1) // 40 + 1)) AS i FROM t)),
          |freq AS (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs_with
          |         FROM ch GROUP BY chunk_hash),
          |perdoc AS (
          |  SELECT doc_id, source, COUNT(*) AS n_chunks,
          |         SUM(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS n_shared
          |  FROM ch JOIN freq USING (chunk_hash)
          |  GROUP BY doc_id, source),
          |r AS (SELECT source,
          |        floor(CAST(n_shared AS DOUBLE) / n_chunks * 1000000.0) / 1000000.0 AS rate
          |      FROM perdoc)
          |SELECT source, COUNT(*) AS n_docs,
          |       CAST(SUM(CASE WHEN rate > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |       floor(CAST(SUM(CAST(rate AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*)
          |             * 1000000.0) / 1000000.0 AS avg_overlap
          |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // ---- corpus vocabulary top-k ----------------------------------------
    // Token frequencies with deterministic rank (count desc, token asc).
    // Scale shape: partial+final hash agg, then orderBy+limit compiles to
    // TakeOrderedAndProject (per-partition top-k, no global sort); the rank
    // window runs on at most k rows.
    "vocab_topk" -> Q(
      fn = (s, dir) => {
        val cnt = Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(100)
        // Global (unpartitioned) rank window — WindowExec warns, but the
        // frame is the ≤100-row post-limit result, not the data: benign.
        cnt.withColumn("rank",
            row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("int"))
          .orderBy("rank")
      },
      oracle = Some(
        """WITH ex AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
          |cnt AS (SELECT token, COUNT(*) AS n FROM ex GROUP BY token),
          |rk AS (SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank FROM cnt)
          |SELECT token, n, CAST(rank AS INTEGER) AS rank FROM rk
          |WHERE rank <= 100 ORDER BY rank""".stripMargin)),

    // ---- within-document repetition filter (Gopher-style) ---------------
    // Duplicate-bigram ratio per doc (1 − distinct/total 2-grams) — the
    // MassiveText/Gopher "repetitive document" signal. Pure per-row
    // expressions (NO explode: transform + array_distinct inside codegen),
    // so the corpus streams straight into the per-source agg — zero shuffle
    // before it, the cheapest possible 100 TB quality-filter shape.
    // Float parity: per-doc ratios are rounded to 6 dp and SUMMED AS
    // DECIMAL (order-independent, exact) before the final double division.
    "repetition_filter" -> Q(
      fn = (s, dir) => {
        val ratio = Q.grid6(
          lit(1.0) - col("d2").cast("double") / col("n2"))
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .withColumn("n2", size(col("toks")) - 1)
          .withColumn("d2", size(array_distinct(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"))))
          .withColumn("ratio", ratio)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("ratio") > 0.10, 1).otherwise(0)).as("n_flagged"),
            Q.grid6(sum(col("ratio").cast("decimal(10,6)")).cast("double") / count(lit(1)))
              .as("avg_repetition"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
          |g AS (SELECT source, len(toks) - 1 AS n2,
          |        len(list_distinct(list_transform(range(len(toks) - 1),
          |          i -> toks[i + 1] || ' ' || toks[i + 2]))) AS d2
          |      FROM t WHERE len(toks) >= 2),
          |r AS (SELECT source,
          |        floor((1.0 - CAST(d2 AS DOUBLE) / n2) * 1000000.0) / 1000000.0 AS ratio FROM g)
          |SELECT source, COUNT(*) AS n_docs,
          |       CAST(SUM(CASE WHEN ratio > 0.10 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |       floor(CAST(SUM(CAST(ratio AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*)
          |             * 1000000.0) / 1000000.0 AS avg_repetition
          |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // ---- rare-token rate vs the corpus top-k vocabulary ------------------
    // Fraction of each source's tokens OUTSIDE the corpus top-20 vocab — the
    // OOV/quality signal behind frequency-based vocab pruning. Scale shape:
    // wordcount partial+final agg → TakeOrderedAndProject(20) → tiny top-k
    // BROADCAST left join back onto the token stream (the corpus side never
    // shuffles for membership), then one per-source agg. Deterministic
    // top-k tie-break (count desc, token asc) on both engines.
    "rare_token_rate" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(20)
          .select(col("tok"), lit(1).as("is_top"))
        toks.join(broadcast(top), Seq("tok"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("is_top").isNull, 1).otherwise(0)).as("n_rare"))
          .withColumn("rare_rate",
            Q.grid6(col("n_rare").cast("double") / col("n_tokens")))
          .orderBy("source")
      },
      oracle = Some(
        """WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
          |top AS (SELECT tok FROM (
          |  SELECT tok, COUNT(*) AS c FROM t GROUP BY tok ORDER BY c DESC, tok LIMIT 20)),
          |a AS (SELECT source, COUNT(*) AS n_tokens,
          |        CAST(SUM(CASE WHEN tok NOT IN (SELECT tok FROM top) THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
          |      FROM t GROUP BY source)
          |SELECT source, n_tokens, n_rare,
          |       floor(CAST(n_rare AS DOUBLE) / n_tokens * 1000000.0) / 1000000.0 AS rare_rate
          |FROM a ORDER BY source""".stripMargin)),

    // ---- unigram LM quality score (CCNet-style perplexity proxy) ---------
    // Per-doc average log-probability under the corpus unigram model — the
    // cheap end of the LM-based quality-scoring family (CCNet/KenLM use
    // 5-gram models; the pipeline shape is identical). Scale shape:
    // wordcount agg → 1-row total (broadcast) → tiny vocab broadcast-joined
    // back onto the token stream → per-doc agg; the corpus side never
    // shuffles before the doc-level aggregate. Float parity: ln() agrees
    // bit-for-bit between engines on this vocab (probed), and per-token
    // logs are rounded to 6 dp and summed AS DECIMAL so the per-doc sum is
    // order-independent; the only remaining float op is one final division,
    // emitted BARE (its r6 trailing round(double, 6) survived only by luck
    // of the data — the same pattern hash-failed on the bigram twin).
    "unigram_logprob" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        val total = vocab.agg(sum(col("n")).as("tt"))
        // per-token ln on LnGrid's integer 1e-6 grid (r8 — the rounded-libm
        // grid was engine-build-dependent); per-doc sums are exact ints,
        // ONE bare final division by the exact n·10^6
        val v = LnGrid.withLn6(vocab.crossJoin(broadcast(total)),
            col("n"), col("tt"), "logp6")
          .select(col("tok"), col("logp6"))
        toks.join(v, Seq("tok")) // unhinted: vocab-sized (see tfidf)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("logp6")).as("sl"))
          .select(col("doc_id"), col("n_tokens"),
            (col("sl").cast("double")
              / (col("n_tokens") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c),
           |cj AS (SELECT tok, n, tt FROM c, tot),
           |${LnGrid.sqlCtes("cj", "n", "tt", "logp6", "lu_")},
           |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |             CAST(SUM(logp6) AS BIGINT) AS sl
           |      FROM t JOIN lu_out USING (tok) GROUP BY doc_id)
           |SELECT doc_id, n_tokens,
           |       CAST(sl AS DOUBLE) / CAST(n_tokens * 1000000 AS DOUBLE) AS logprob
           |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- per-doc token entropy (added r6; LnGrid r8) ---------------------
    // Shannon entropy of the doc's own token distribution,
    // H = −Σ (c/n)·ln(c/n) — the information-density quality signal:
    // near-zero for degenerate repetition ("spam spam spam"), high for
    // diverse text; complements repetition_filter (bigram structure) and
    // unigram_logprob (corpus-relative likelihood) with a corpus-FREE
    // per-doc measure. Algebra: H = −(Σ c·ln(c/n))/n, so the only ln is
    // over the exact-int ratio c/n. ENGINE-VERSION-PROOF (r8 doctrine,
    // Queries.scala): that ln is [[LnGrid]]'s fixed-point integer chain —
    // the r6/r7 rounded-libm grid matched the local DuckDB bitwise yet
    // hash-failed the driver's build; the LnGrid value is pure int64
    // arithmetic on both engines. Σ c·ln6 is an exact int sum; the output
    // is ONE bare IEEE division by the exact n·10^6. Scale shape: one
    // (doc, tok) hash agg, a per-doc roll-up, and a doc-keyed join — all
    // linear, no corpus-wide state at all.
    "token_entropy" -> Q(
      fn = (s, dir) => {
        val tf = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val totals = tf.groupBy("doc_id").agg(sum(col("c")).as("n"))
        LnGrid.withLn6(tf.join(totals, Seq("doc_id")), col("c"), col("n"), "l6")
          .select(col("doc_id"), col("n"), (col("l6") * col("c")).as("term"))
          .groupBy("doc_id")
          .agg(max(col("n")).as("n_tokens"), sum(col("term")).as("st"))
          .select(col("doc_id"), col("n_tokens"),
            (-col("st").cast("double")
              / (col("n_tokens") * lit(1000000L)).cast("double")).as("entropy"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY doc_id, tok),
           |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY doc_id),
           |j AS (SELECT tf.doc_id, tf.c, n.n FROM tf JOIN n ON tf.doc_id = n.doc_id),
           |${LnGrid.sqlCtes("j", "c", "n", "l6", "le_")},
           |terms AS (SELECT doc_id, n, l6 * c AS term FROM le_out)
           |SELECT doc_id, MAX(n) AS n_tokens,
           |       -CAST(SUM(term) AS DOUBLE) / CAST(MAX(n) * 1000000 AS DOUBLE) AS entropy
           |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- top collocations by PMI (added r6) ------------------------------
    // Pointwise mutual information of adjacent token pairs,
    // PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) = nb/B over
    // bigram occurrences and p(a) = c/T over tokens — the classic
    // collocation/phrase-mining primitive (the "New York" detector that
    // feeds phrase-aware tokenizers). Support floor nb ≥ 20 kills the
    // low-count PMI explosion. ENGINE-VERSION-PROOF (r8 doctrine): PMI
    // decomposes into count-sized ln ratios —
    // PMI = ln(nb/bt) − ln(ca/tt) − ln(cb/tt) — each a [[LnGrid]]
    // fixed-point integer value; grid values subtract EXACTLY as int64,
    // so the ranking key is deterministic on any engine, and the emitted
    // pmi is one bare division by 10^6. (The decomposition also keeps
    // every ln argument count-sized — no nb·tt² product to overflow.)
    // Scale shape: bigram + unigram aggs off one corpus pass each, two
    // vocab-sized joins (unhinted), TakeOrderedAndProject for the top-25.
    "pmi_top_pairs" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
        val uni = toks
          .select(explode(col("toks")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val tTot = uni.agg(sum(col("c")).as("tt"))
        val bi = toks
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("nb"))
          .filter(col("nb") >= 20)
        val bTot = bi.agg(sum(col("nb")).as("bt"))
        val j0 = bi
          .join(uni.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
          .join(uni.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
          .crossJoin(broadcast(bTot))
          .crossJoin(broadcast(tTot))
        val j1 = LnGrid.withLn6(j0, col("nb"), col("bt"), "lb6", "__pb_")
        val j2 = LnGrid.withLn6(j1, col("ca"), col("tt"), "la6", "__pa_")
        val j3 = LnGrid.withLn6(j2, col("cb"), col("tt"), "lc6", "__pc_")
        val pmi = j3.withColumn("pmi6", col("lb6") - col("la6") - col("lc6"))
          .withColumn("pmi", col("pmi6").cast("double") / lit(1000000.0d))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi6").desc, col("a"), col("b"))
        pmi.orderBy(col("pmi6").desc, col("a"), col("b")).limit(25)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("a"), col("b"), col("nb"), col("pmi"))
          .orderBy("rank")
      },
      oracle = Some(
        s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
           |uni AS (SELECT UNNEST(toks) AS tok FROM t),
           |u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok),
           |tt AS (SELECT CAST(SUM(c) AS BIGINT) AS tt FROM u),
           |bix AS (SELECT UNNEST(list_transform(range(len(toks) - 1),
           |          i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
           |        FROM t WHERE len(toks) >= 2),
           |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nb
           |       FROM bix GROUP BY a, b HAVING COUNT(*) >= 20),
           |bt AS (SELECT CAST(SUM(nb) AS BIGINT) AS bt FROM bi),
           |j AS (SELECT bi.a, bi.b, bi.nb, ua.c AS ca, ub.c AS cb, bt.bt, tt.tt
           |      FROM bi JOIN u ua ON bi.a = ua.tok JOIN u ub ON bi.b = ub.tok
           |           CROSS JOIN bt CROSS JOIN tt),
           |${LnGrid.sqlCtes("j", "nb", "bt", "lb6", "pb_")},
           |${LnGrid.sqlCtes("pb_out", "ca", "tt", "la6", "pa_")},
           |${LnGrid.sqlCtes("pa_out", "cb", "tt", "lc6", "pc_")},
           |pmi AS (SELECT a, b, nb, lb6 - la6 - lc6 AS pmi6,
           |               CAST(lb6 - la6 - lc6 AS DOUBLE) / 1000000.0 AS pmi
           |        FROM pc_out),
           |rk AS (SELECT a, b, nb, pmi,
           |              ROW_NUMBER() OVER (ORDER BY pmi6 DESC, a, b) AS rank FROM pmi)
           |SELECT CAST(rank AS INTEGER) AS rank, a, b, nb, pmi
           |FROM rk WHERE rank <= 25 ORDER BY rank""".stripMargin)),

    // ---- windowed skip-gram PMI (added r7) -------------------------------
    // pmi_top_pairs generalized from adjacent bigrams to a ±2 co-occurrence
    // window — the word2vec/GloVe counting shape (Mikolov et al. 2013 train
    // on exactly these skip-gram pairs; Levy & Goldberg 2014 show word2vec
    // implicitly factorizes THIS windowed-PMI matrix). Ordered pairs at
    // distances 1 and 2; PMI over pair occurrences with p(a)·p(b) from the
    // unigram distribution. Support floor nb ≥ 40 (2× the adjacent floor —
    // the window doubles pair mass) kills the low-count PMI explosion.
    // ENGINE-VERSION-PROOF (r8): identical [[LnGrid]] decomposition to
    // pmi_top_pairs — three count-sized integer ln6 values, exact int
    // ranking key, one bare division. Scale shape: the
    // d=1 and d=2 pair streams are two map-side explodes of the SAME scan
    // unioned BEFORE the one vocab²-bounded agg; two vocab-sized joins;
    // TakeOrderedAndProject for the top-25. Widening the window only
    // scales the map-side explode factor — no new shuffle at any W.
    "skipgram_pmi" -> Q(
      fn = (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
        val uni = toks
          .select(explode(col("toks")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val tTot = uni.agg(sum(col("c")).as("tt"))
        def skipPairs(d: Int) = toks
          .filter(size(col("toks")) >= d + 1)
          .select(explode(expr(
            s"""transform(sequence(0, size(toks) - ${d + 1}),
               |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 1 + $d) AS b))"""
              .stripMargin)).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
        val bi = skipPairs(1).union(skipPairs(2))
          .groupBy("a", "b").agg(count(lit(1)).as("nb"))
          .filter(col("nb") >= 40)
        val bTot = bi.agg(sum(col("nb")).as("bt"))
        val j0 = bi
          .join(uni.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
          .join(uni.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
          .crossJoin(broadcast(bTot))
          .crossJoin(broadcast(tTot))
        val j1 = LnGrid.withLn6(j0, col("nb"), col("bt"), "lb6", "__sb_")
        val j2 = LnGrid.withLn6(j1, col("ca"), col("tt"), "la6", "__sa_")
        val j3 = LnGrid.withLn6(j2, col("cb"), col("tt"), "lc6", "__sc_")
        val pmi = j3.withColumn("pmi6", col("lb6") - col("la6") - col("lc6"))
          .withColumn("pmi", col("pmi6").cast("double") / lit(1000000.0d))
        val w = Window.orderBy(col("pmi6").desc, col("a"), col("b"))
        pmi.orderBy(col("pmi6").desc, col("a"), col("b")).limit(25)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(col("rank"), col("a"), col("b"), col("nb"), col("pmi"))
          .orderBy("rank")
      },
      oracle = Some(
        """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
          |uni AS (SELECT UNNEST(toks) AS tok FROM t),
          |u AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
          |tt AS (SELECT SUM(c) AS tt FROM u),
          |b1 AS (SELECT UNNEST(list_transform(range(len(toks) - 1),
          |          i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
          |       FROM t WHERE len(toks) >= 2),
          |b2 AS (SELECT UNNEST(list_transform(range(len(toks) - 2),
          |          i -> {'a': toks[i + 1], 'b': toks[i + 3]}), recursive := true)
          |       FROM t WHERE len(toks) >= 3),
          |bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nb
          |       FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
          |       GROUP BY a, b HAVING COUNT(*) >= 40),
          |bt AS (SELECT CAST(SUM(nb) AS BIGINT) AS bt FROM bi),
          |j AS (SELECT bi.a, bi.b, bi.nb, ua.c AS ca, ub.c AS cb, bt.bt, tt.tt
          |      FROM bi JOIN u ua ON bi.a = ua.tok JOIN u ub ON bi.b = ub.tok
          |           CROSS JOIN bt CROSS JOIN tt),
""".stripMargin + LnGrid.sqlCtes("j", "nb", "bt", "lb6", "sb_") + ",\n" +
          LnGrid.sqlCtes("sb_out", "ca", "tt", "la6", "sa_") + ",\n" +
          LnGrid.sqlCtes("sa_out", "cb", "tt", "lc6", "sc_") + """,
          |pmi AS (SELECT a, b, nb, lb6 - la6 - lc6 AS pmi6,
          |               CAST(lb6 - la6 - lc6 AS DOUBLE) / 1000000.0 AS pmi
          |        FROM sc_out),
          |rk AS (SELECT a, b, nb, pmi,
          |              ROW_NUMBER() OVER (ORDER BY pmi6 DESC, a, b) AS rank FROM pmi)
          |SELECT CAST(rank AS INTEGER) AS rank, a, b, nb, pmi
          |FROM rk WHERE rank <= 25 ORDER BY rank""".stripMargin)),

    // ---- per-doc bigram log-probability (added r6; LnGrid r8) ------------
    // The order-2 refinement of unigram_logprob — the CCNet/KenLM-proxy
    // quality score one step up: per doc, the mean ln p(w_i | w_{i-1})
    // under the corpus MLE bigram model p(b|a) = C(a,b) / C(a,·). The
    // context total C(a,·) FALLS OUT of the bigram agg (sum over its rows
    // per first token — no second corpus pass, the tfidf df trick).
    // ENGINE-VERSION-PROOF (r8 doctrine, Queries.scala): the per-edge ln
    // is [[LnGrid]]'s fixed-point integer chain (the r6/r7 rounded-libm
    // grid hash-failed the driver's build while matching the local one
    // bitwise); per-doc Σ ln6·c is an exact int sum and the mean is ONE
    // bare IEEE division by the exact n·10^6. Scale shape: one corpus
    // bigram pass; the model is bigram-vocabulary-sized and joins
    // unhinted (AQE broadcasts when it fits); per-doc agg carries two
    // numbers.
    "bigram_logprob" -> Q(
      fn = (s, dir) => {
        // ONE corpus pass: the per-(doc, a, b) multiplicity agg feeds
        // everything — nb = Σ c per (a, b), na = Σ nb per a, and the
        // per-doc score joins the (doc-distinct-bigram)-sized tf3 frame,
        // not the raw corpus bigram stream, weighting each ln6 by its
        // exact int multiplicity (int × int is exact).
        // r16 batch 3: the model branch and the per-doc scoring join both
        // re-ran the corpus bigram explode (ReuseCheck: 5 executed scans,
        // 1 reused) — materialize tf3 once. The context total na is the
        // sum over the `a` window of the SAME counts frame (an INNER
        // join-back of counts with its own re-aggregation — every a in
        // counts is in ctx), so the ctx aggregate + join collapse into one
        // window over one exchange (guide §2.4, the batch-2 df precedent).
        val tf3 = Q.truncate(Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("doc_id"), col("e.a").as("a"), col("e.b").as("b"))
          .groupBy("doc_id", "a", "b").agg(count(lit(1)).as("c")))
        val counts = tf3.groupBy("a", "b").agg(sum(col("c")).as("nb"))
          .withColumn("na", sum(col("nb")).over(Window.partitionBy(col("a"))))
        val model = LnGrid.withLn6(counts, col("nb"), col("na"), "logp6")
          .select(col("a"), col("b"), col("logp6"))
        tf3.join(model, Seq("a", "b"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_bigrams"), sum(col("logp6") * col("c")).as("sl"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("sl").cast("double")
              / (col("n_bigrams") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |bi AS (SELECT doc_id, UNNEST(list_transform(range(len(toks) - 1),
           |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
           |       FROM t WHERE len(toks) >= 2),
           |tf3 AS (SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS c
           |        FROM bi GROUP BY doc_id, a, b),
           |cnt AS (SELECT a, b, CAST(SUM(c) AS BIGINT) AS nb FROM tf3 GROUP BY a, b),
           |cx AS (SELECT a, CAST(SUM(nb) AS BIGINT) AS na FROM cnt GROUP BY a),
           |mj AS (SELECT cnt.a, cnt.b, nb, na FROM cnt JOIN cx ON cnt.a = cx.a),
           |${LnGrid.sqlCtes("mj", "nb", "na", "logp6", "lb_")},
           |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           |               CAST(SUM(logp6 * c) AS BIGINT) AS sl
           |        FROM tf3 JOIN lb_out m ON tf3.a = m.a AND tf3.b = m.b GROUP BY doc_id)
           |SELECT doc_id, n_bigrams,
           |       CAST(sl AS DOUBLE) / CAST(n_bigrams * 1000000 AS DOUBLE) AS logprob
           |FROM agg ORDER BY doc_id""".stripMargin)),

    // ---- held-out bigram perplexity proxy (added r7) ---------------------
    // The honest version of bigram_logprob's quality score: the model is
    // trained ONLY on the train split (train_split's exact md5-band rule,
    // 204/256) and scored on the VAL split — so the number measures
    // generalization, not memorization, which is what a perplexity-based
    // quality filter actually needs (a model scored on its own training
    // text systematically flatters duplicated boilerplate). Add-1
    // smoothing over the train unigram vocabulary handles val-only
    // bigrams/contexts: p(b|a) = (nb + 1)/(na + V) — the dsir_weights
    // smoothing discipline. ENGINE-VERSION-PROOF (r8 doctrine,
    // Queries.scala): the per-edge ln is [[LnGrid]]'s fixed-point integer
    // chain over the exact-int smoothed ratio (the r7 rounded-libm grid
    // hash-failed the driver's build while matching the local one
    // bitwise); exact multiplicity weighting, ONE bare final IEEE
    // division by the exact n·10^6.
    //
    // Scale shape: one corpus pass split by the hash band; model joins are
    // vocab-sized and deliberately un-hinted; V is a 1-row broadcast (R1
    // whitelist). The val side joins LEFT so unseen bigrams score through
    // the smoothing floor instead of vanishing.
    "heldout_bigram_ppl" -> Q(
      fn = (s, dir) => {
        val assigned = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
        // r16 batch 3: the train and val branches both re-ran the corpus
        // bigram explode (the h2 filters push below the per-doc agg, so the
        // two subtrees are canonically different and exchange reuse never
        // fires — ReuseCheck: 8 executed scans, 0 reused). Materialize the
        // per-doc bigram counts ONCE, pre-filtered to the union band
        // h2 < 'e6' (rows ≥ 'e6' feed neither branch); train/val are then
        // cheap filters of the checkpoint — one corpus bigram pass at any
        // scale (vocab's distinct-token pass stays: it counts raw train
        // tokens, including docs the len ≥ 2 filter drops).
        val tf3 = Q.truncate(assigned
          .filter(col("h2") < "e6")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("h2"), explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("doc_id"), col("h2"), col("e.a").as("a"), col("e.b").as("b"))
          .groupBy("doc_id", "h2", "a", "b").agg(count(lit(1)).as("c")))
        val train = tf3.filter(col("h2") < "cc")
        val counts = train.groupBy("a", "b").agg(sum(col("c")).as("nb"))
        val ctx = counts.groupBy("a").agg(sum(col("nb")).as("na"))
        val vocab = assigned.filter(col("h2") < "cc")
          .select(explode(split(col("text"), " ")).as("tok"))
          .agg(count_distinct(col("tok")).as("v"))
        val vd = tf3.filter(col("h2") >= "cc" && col("h2") < "e6")
        val scored = LnGrid.withLn6(
          vd.join(counts, Seq("a", "b"), "left")
            .join(ctx, Seq("a"), "left")
            .crossJoin(broadcast(vocab)),
          coalesce(col("nb"), lit(0L)) + 1L,
          coalesce(col("na"), lit(0L)) + col("v"), "logp6")
        scored
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_bigrams"), sum(col("logp6") * col("c")).as("sl"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("sl").cast("double")
              / (col("n_bigrams") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
          |             substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) AS h2
          |           FROM documents),
          |bi AS (SELECT doc_id, h2, UNNEST(list_transform(range(len(toks) - 1),
          |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
          |       FROM t WHERE len(toks) >= 2),
          |tf3 AS (SELECT doc_id, h2, a, b, COUNT(*) AS c FROM bi GROUP BY doc_id, h2, a, b),
          |cnt AS (SELECT a, b, SUM(c) AS nb FROM tf3 WHERE h2 < 'cc' GROUP BY a, b),
          |cx AS (SELECT a, SUM(nb) AS na FROM cnt GROUP BY a),
          |v AS (SELECT COUNT(DISTINCT tok) AS v FROM (
          |        SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
          |        WHERE substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'cc')),
          |sj AS (
          |  SELECT tf3.doc_id, tf3.c,
          |         CAST(COALESCE(cnt.nb, 0) AS BIGINT) + 1 AS sm_a,
          |         CAST(COALESCE(cx.na, 0) AS BIGINT) + CAST(v.v AS BIGINT) AS sm_b
          |  FROM tf3 LEFT JOIN cnt ON tf3.a = cnt.a AND tf3.b = cnt.b
          |           LEFT JOIN cx ON tf3.a = cx.a
          |           CROSS JOIN v
          |  WHERE tf3.h2 >= 'cc' AND tf3.h2 < 'e6'),
""".stripMargin + LnGrid.sqlCtes("sj", "sm_a", "sm_b", "logp6", "lh_") + """,
          |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
          |               CAST(SUM(logp6 * c) AS BIGINT) AS sl
          |        FROM lh_out GROUP BY doc_id)
          |SELECT doc_id, n_bigrams,
          |       CAST(sl AS DOUBLE) / CAST(n_bigrams * 1000000 AS DOUBLE) AS logprob
          |FROM agg ORDER BY doc_id""".stripMargin)),

    // ---- Jelinek–Mercer interpolated bigram scoring (added r8) -----------
    // The classical fix for heldout_bigram_ppl's add-1 smoothing: score the
    // val band under p(b|a) = λ·p₂(b|a) + (1−λ)·p₁(b), λ = 3/4 — the
    // bigram MLE backed off to the train unigram (Jelinek & Mercer 1980;
    // Chen & Goodman 1999 measure JM as the robust baseline). Unseen
    // bigrams fall to the unigram floor instead of a uniform-V floor, so
    // common-next-token transitions score realistically where add-1
    // over-penalizes them.
    //
    // ENGINE-VERSION-PROOF (r8): both component probabilities live on the
    // exact integer 10^-6 grid (p2m = (nb·10^6) div na, p1m = (cb·10^6)
    // div T — pure int64 floor division); the λ-mix is pure integers
    // (3·p2m + p1m) div 4, floored to ≥1 so ln is defined even for a
    // val-only token; the ln is [[LnGrid]] over (mix6, 10^6); exact
    // multiplicity weighting; one bare final division by n·10^6.
    //
    // Scale shape: heldout_bigram_ppl's exactly — one corpus pass split by
    // the hash band, vocab-sized un-hinted model joins (LEFT on the val
    // side), a 1-row train-total broadcast.
    "interp_bigram_ppl" -> Q(
      fn = (s, dir) => {
        val assigned = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
        // r16 batch 3 (heldout_bigram_ppl's fix, plus the unigram leg): the
        // train/val branches re-ran the corpus bigram explode, and the
        // unigram model re-ran the train-split token explode for BOTH its
        // consumers (the val join and the 1-row total) — ReuseCheck: 9
        // executed scans, 1 reused. Materialize the per-doc bigram counts
        // (pre-filtered to the h2 < 'e6' union band) and the vocab-sized
        // unigram counts ONCE, the two independent jobs overlapped (§2.6);
        // tTot reads the checkpointed uni. Two corpus passes at any scale
        // (bigram + unigram grain), down from four.
        val Seq(tf3, uni) = Q.truncatePar(Seq(
          assigned
            .filter(col("h2") < "e6")
            .withColumn("toks", split(col("text"), " "))
            .filter(size(col("toks")) >= 2)
            .select(col("doc_id"), col("h2"), explode(expr(
              """transform(sequence(0, size(toks) - 2),
                |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
                .stripMargin)).as("e"))
            .select(col("doc_id"), col("h2"), col("e.a").as("a"), col("e.b").as("b"))
            .groupBy("doc_id", "h2", "a", "b").agg(count(lit(1)).as("c")),
          assigned.filter(col("h2") < "cc")
            .select(explode(split(col("text"), " ")).as("b"))
            .groupBy("b").agg(count(lit(1)).as("cb"))))
        val train = tf3.filter(col("h2") < "cc")
        val counts = train.groupBy("a", "b").agg(sum(col("c")).as("nb"))
        val ctx = counts.groupBy("a").agg(sum(col("nb")).as("na"))
        val tTot = uni.agg(sum(col("cb")).as("tt"))
        val vd = tf3.filter(col("h2") >= "cc" && col("h2") < "e6")
        val mixed = vd
          .join(counts, Seq("a", "b"), "left")
          .join(ctx, Seq("a"), "left")
          .join(uni, Seq("b"), "left")
          .crossJoin(broadcast(tTot))
          .withColumn("p2m", expr(
            "CASE WHEN na IS NULL OR na = 0 THEN 0 ELSE (coalesce(nb, 0) * 1000000) div na END"))
          .withColumn("p1m", expr("(coalesce(cb, 0) * 1000000) div tt"))
          .withColumn("mix6", expr("greatest((3 * p2m + p1m) div 4, 1)"))
        LnGrid.withLn6(mixed, col("mix6"), lit(1000000L), "logp6")
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_bigrams"), sum(col("logp6") * col("c")).as("sl"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("sl").cast("double")
              / (col("n_bigrams") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
           |             substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) AS h2
           |           FROM documents),
           |bi AS (SELECT doc_id, h2, UNNEST(list_transform(range(len(toks) - 1),
           |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
           |       FROM t WHERE len(toks) >= 2),
           |tf3 AS (SELECT doc_id, h2, a, b, CAST(COUNT(*) AS BIGINT) AS c
           |        FROM bi GROUP BY doc_id, h2, a, b),
           |cnt AS (SELECT a, b, CAST(SUM(c) AS BIGINT) AS nb
           |        FROM tf3 WHERE h2 < 'cc' GROUP BY a, b),
           |cx AS (SELECT a, CAST(SUM(nb) AS BIGINT) AS na FROM cnt GROUP BY a),
           |uni AS (SELECT tok AS b, CAST(COUNT(*) AS BIGINT) AS cb FROM (
           |          SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
           |          WHERE substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) < 'cc')
           |        GROUP BY tok),
           |tt AS (SELECT CAST(SUM(cb) AS BIGINT) AS tt FROM uni),
           |mx AS (
           |  SELECT tf3.doc_id, tf3.c,
           |         greatest((3 * (CASE WHEN cx.na IS NULL OR cx.na = 0 THEN 0
           |                             ELSE (CAST(COALESCE(cnt.nb, 0) AS BIGINT) * 1000000) // cx.na END)
           |                   + (CAST(COALESCE(uni.cb, 0) AS BIGINT) * 1000000) // tt.tt) // 4,
           |                  1) AS mix6
           |  FROM tf3 LEFT JOIN cnt ON tf3.a = cnt.a AND tf3.b = cnt.b
           |           LEFT JOIN cx ON tf3.a = cx.a
           |           LEFT JOIN uni ON tf3.b = uni.b
           |           CROSS JOIN tt
           |  WHERE tf3.h2 >= 'cc' AND tf3.h2 < 'e6'),
           |${LnGrid.sqlCtes("mx", "mix6", "1000000", "logp6", "im_")},
           |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           |               CAST(SUM(logp6 * c) AS BIGINT) AS sl
           |        FROM im_out GROUP BY doc_id)
           |SELECT doc_id, n_bigrams,
           |       CAST(sl AS DOUBLE) / CAST(n_bigrams * 1000000 AS DOUBLE) AS logprob
           |FROM agg ORDER BY doc_id""".stripMargin)),

    // ---- interpolated Kneser–Ney bigram scoring (added r8) ---------------
    // Completes the smoothing family (add-1 → Jelinek–Mercer → KN): score
    // the val band under interpolated Kneser–Ney with absolute discount
    // D = 3/4 (Kneser & Ney 1995; Chen & Goodman 1999 find it the
    // strongest bigram smoother):
    //   p_KN(b|a) = max(c(ab) − D, 0)/c(a)
    //             + (D/c(a)) · N1+(a·) · N1+(·b)/N_bt
    // where N1+(a·) = distinct continuations of context a, N1+(·b) =
    // distinct LEFT contexts of b (the "how many songs is she in"
    // continuation count — a token frequent only inside one collocation
    // gets LOW backoff mass, which raw-unigram backoff gets wrong), and
    // N_bt = distinct train bigram types. A context unseen in train backs
    // off to the continuation distribution p_cont(b) = N1+(·b)/N_bt.
    //
    // ENGINE-VERSION-PROOF (r8 doctrine): D = 3/4 makes the whole formula
    // integral — multiplying through by 4·c(a)·N_bt gives
    //   p6 = (max(4·nb − 3, 0)·N_bt + 3·n1f·n1b) · 10^6 div (4·na·N_bt)
    // — pure int64 (gate bounds: nb ≤ 292, N_bt = 931, na ≤ 7146 at
    // sf0.1, so the numerator tops out ~1.1e12·10^6 ≈ 1.1e15 ≪ 2^63; a
    // 100 TB corpus widens to DECIMAL(38,0), the token_burstiness
    // discipline), floored to ≥ 1 so ln is defined, then [[LnGrid]] ln and
    // exact multiplicity weighting with ONE bare final division.
    //
    // Scale shape: heldout_bigram_ppl's exactly — one corpus pass split by
    // the hash band; the continuation counts N1+(a·)/N1+(·b) fall out of
    // the SAME train bigram agg (no extra corpus pass); vocab-sized
    // un-hinted model joins; a 1-row N_bt broadcast (R1 whitelist).
    "kn_bigram_ppl" -> Q(
      fn = (s, dir) => {
        val assigned = Tables.load(s, dir, "documents")
          .withColumn("h2",
            substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
        // r16 batch 3: same corpus-pass dedup as heldout/interp (ReuseCheck:
        // 10 executed scans, 0 reused), plus the KN-specific hazard — the
        // train bigram model `counts` feeds FOUR branches (ctx, contb, nbt,
        // and the val join), each of which re-ran the corpus explode + two
        // aggregations. Materialize the per-doc counts (h2 < 'e6' band) and
        // the vocab²-sized model; every continuation count then reads the
        // model checkpoint. One corpus bigram pass at any scale, down from
        // five.
        val tf3 = Q.truncate(assigned
          .filter(col("h2") < "e6")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("h2"), explode(expr(
            """transform(sequence(0, size(toks) - 2),
              |  i -> struct(element_at(toks, i + 1) AS a, element_at(toks, i + 2) AS b))"""
              .stripMargin)).as("e"))
          .select(col("doc_id"), col("h2"), col("e.a").as("a"), col("e.b").as("b"))
          .groupBy("doc_id", "h2", "a", "b").agg(count(lit(1)).as("c")))
        val counts = Q.truncate(tf3.filter(col("h2") < "cc")
          .groupBy("a", "b").agg(sum(col("c")).as("nb")))
        val ctx = counts.groupBy("a")
          .agg(sum(col("nb")).as("na"), count(lit(1)).as("n1f"))
        val contb = counts.groupBy("b").agg(count(lit(1)).as("n1b"))
        val nbt = counts.agg(count(lit(1)).as("nbt"))
        val vd = tf3.filter(col("h2") >= "cc" && col("h2") < "e6")
        val mixed = vd
          .join(counts, Seq("a", "b"), "left")
          .join(ctx, Seq("a"), "left")
          .join(contb, Seq("b"), "left")
          .crossJoin(broadcast(nbt))
          .withColumn("p6", expr(
            """CASE WHEN na IS NULL OR nbt = 0
              |       THEN (coalesce(n1b, 0) * 1000000) div greatest(nbt, 1)
              |     ELSE ((greatest(4 * coalesce(nb, 0) - 3, 0) * nbt
              |            + 3 * n1f * coalesce(n1b, 0)) * 1000000)
              |          div (4 * na * nbt) END""".stripMargin))
          .withColumn("mix6", greatest(col("p6"), lit(1L)))
        LnGrid.withLn6(mixed, col("mix6"), lit(1000000L), "logp6")
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_bigrams"), sum(col("logp6") * col("c")).as("sl"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("sl").cast("double")
              / (col("n_bigrams") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
           |             substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 2) AS h2
           |           FROM documents),
           |bi AS (SELECT doc_id, h2, UNNEST(list_transform(range(len(toks) - 1),
           |         i -> {'a': toks[i + 1], 'b': toks[i + 2]}), recursive := true)
           |       FROM t WHERE len(toks) >= 2),
           |tf3 AS (SELECT doc_id, h2, a, b, CAST(COUNT(*) AS BIGINT) AS c
           |        FROM bi GROUP BY doc_id, h2, a, b),
           |cnt AS (SELECT a, b, CAST(SUM(c) AS BIGINT) AS nb
           |        FROM tf3 WHERE h2 < 'cc' GROUP BY a, b),
           |cx AS (SELECT a, CAST(SUM(nb) AS BIGINT) AS na,
           |              CAST(COUNT(*) AS BIGINT) AS n1f FROM cnt GROUP BY a),
           |cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n1b FROM cnt GROUP BY b),
           |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbt FROM cnt),
           |mx AS (
           |  SELECT tf3.doc_id, tf3.c,
           |         greatest(CASE WHEN cx.na IS NULL OR nt.nbt = 0
           |                         THEN (CAST(COALESCE(cb.n1b, 0) AS BIGINT) * 1000000)
           |                              // greatest(nt.nbt, 1)
           |                       ELSE ((greatest(4 * CAST(COALESCE(cnt.nb, 0) AS BIGINT) - 3, 0)
           |                              * nt.nbt
           |                              + 3 * cx.n1f * CAST(COALESCE(cb.n1b, 0) AS BIGINT))
           |                             * 1000000)
           |                            // (4 * cx.na * nt.nbt) END,
           |                  1) AS mix6
           |  FROM tf3 LEFT JOIN cnt ON tf3.a = cnt.a AND tf3.b = cnt.b
           |           LEFT JOIN cx ON tf3.a = cx.a
           |           LEFT JOIN cb ON tf3.b = cb.b
           |           CROSS JOIN nt
           |  WHERE tf3.h2 >= 'cc' AND tf3.h2 < 'e6'),
           |${LnGrid.sqlCtes("mx", "mix6", "1000000", "logp6", "kn_")},
           |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           |               CAST(SUM(logp6 * c) AS BIGINT) AS sl
           |        FROM kn_out GROUP BY doc_id)
           |SELECT doc_id, n_bigrams,
           |       CAST(sl AS DOUBLE) / CAST(n_bigrams * 1000000 AS DOUBLE) AS logprob
           |FROM agg ORDER BY doc_id""".stripMargin)),

    // ---- sequence packing (concat-and-chunk, added r5) -------------------
    // Assign documents to fixed 256-token training packs: concatenate each
    // stream in doc_id order and a doc joins the pack where its first token
    // lands — the standard pretraining packer. Streams are (source, 200-doc
    // block): the block bound caps window-group size, mirroring how a
    // production packer seals packs per input shard instead of threading one
    // cumsum through 100 TB — so the ordered-cumsum window parallelizes
    // across shards by construction. Integer-only arithmetic throughout
    // (token counts, `div`), so parity is exact with no float discipline.
    "pack_sequences" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy("source", "blk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "documents")
          .withColumn("n_toks", size(split(col("text"), " ")))
          .withColumn("blk", expr("doc_id div 200"))
          .withColumn("cum", sum(col("n_toks")).over(w))
          .withColumn("pack", expr("(cum - n_toks) div 256"))
          // group on the RAW (source, blk, pack): the window's (source, blk)
          // hash partitioning is a subset of these keys, so the aggregate
          // reuses it with no second exchange — casting inside groupBy would
          // change the grouping expressions and force a re-shuffle of the
          // whole doc stream (verified via explain)
          .groupBy("source", "blk", "pack")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("pack_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .select(col("source"), col("blk").cast("int").as("blk"),
            col("pack").cast("int").as("pack"),
            col("n_docs"), col("pack_tokens"), col("first_doc"), col("last_doc"))
          .orderBy("source", "blk", "pack")
      },
      oracle = Some(
        """WITH t AS (SELECT doc_id, source, doc_id // 200 AS blk,
          |             len(string_split(text, ' ')) AS n_toks FROM documents),
          |c AS (SELECT doc_id, source, blk, n_toks,
          |        SUM(n_toks) OVER (PARTITION BY source, blk ORDER BY doc_id
          |                          ROWS UNBOUNDED PRECEDING) AS cum
          |      FROM t)
          |SELECT source, CAST(blk AS INTEGER) AS blk,
          |       CAST((cum - n_toks) // 256 AS INTEGER) AS pack,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(n_toks) AS BIGINT) AS pack_tokens,
          |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- sequence-packing efficiency audit (added r8) --------------------
    // The closing number a pack-length decision needs: for candidate pack
    // lengths L ∈ {128, 256, 512}, per source, how much of the allocated
    // token budget is PADDING? pack_sequences' concat-and-chunk packer
    // seals packs per (source, 200-doc block) stream, so each stream's
    // waste is exactly ceil(tot/L)·L − tot (only the last pack is
    // partial). Small L wastes little per stream but caps sequence
    // context; large L amortizes worse on short streams — this table is
    // the curve a training-efficiency review reads before fixing L.
    // Integer-only arithmetic (ceil via (t + L − 1) div L); utilization is
    // ONE bare division of exact ints. Scale shape: one corpus pass to
    // per-stream totals (the packer's own partitioning), then a ≤
    // sources×|L| roll-up — nothing corpus-sized after the first agg.
    "pack_efficiency" -> Q(
      fn = (s, dir) => {
        val streams = Tables.load(s, dir, "documents")
          .withColumn("blk", expr("doc_id div 200"))
          .groupBy("source", "blk")
          .agg(sum(size(split(col("text"), " "))).as("tot"))
        val lens = Seq(128L, 256L, 512L)
        lens.map { l =>
          streams
            .withColumn("pack_len", lit(l))
            .withColumn("n_packs", expr(s"(tot + ${l - 1}) div $l"))
            .groupBy("source", "pack_len")
            .agg(count(lit(1)).as("n_streams"),
              sum(col("tot")).as("n_tokens"),
              sum(col("n_packs")).as("n_packs"))
            .withColumn("n_padding", col("n_packs") * col("pack_len") - col("n_tokens"))
            .withColumn("utilization",
              col("n_tokens").cast("double")
                / (col("n_packs") * col("pack_len")).cast("double"))
        }.reduce(_ unionByName _)
          .select("source", "pack_len", "n_streams", "n_tokens", "n_packs",
            "n_padding", "utilization")
          .orderBy("source", "pack_len")
      },
      oracle = Some(
        """WITH st AS (SELECT source, doc_id // 200 AS blk,
          |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot
          |            FROM documents GROUP BY source, blk),
          |ls(pack_len) AS (VALUES (CAST(128 AS BIGINT)), (CAST(256 AS BIGINT)),
          |                        (CAST(512 AS BIGINT))),
          |g AS (SELECT source, pack_len, CAST(COUNT(*) AS BIGINT) AS n_streams,
          |             CAST(SUM(tot) AS BIGINT) AS n_tokens,
          |             CAST(SUM((tot + pack_len - 1) // pack_len) AS BIGINT) AS n_packs
          |      FROM st CROSS JOIN ls GROUP BY source, pack_len)
          |SELECT source, pack_len, n_streams, n_tokens, n_packs,
          |       n_packs * pack_len - n_tokens AS n_padding,
          |       CAST(n_tokens AS DOUBLE)
          |         / CAST(n_packs * pack_len AS DOUBLE) AS utilization
          |FROM g ORDER BY source, pack_len""".stripMargin)),

    // ---- top-k vocabulary coverage curve (added r8) ----------------------
    // How much of the corpus's token MASS does a k-entry vocabulary cover?
    // The Zipf-complement a tokenizer-budget decision reads: coverage(k)
    // for k ∈ {10, 100, 1000} over the (count desc, token asc)-ranked
    // vocabulary. Natural text covers fast (Zipf); a corpus whose curve is
    // flat is template/ID-heavy and needs a bigger vocab or byte fallback.
    // Exact integers until ONE bare division per row. Scale shape: vocab
    // agg with map-side combine → TakeOrderedAndProject(1000) → the three
    // conditional sums run over ≤1000 rows; the total is a 1-row broadcast
    // (R1-whitelisted shape).
    "vocab_coverage" -> Q(
      fn = (s, dir) => {
        val cnt = Tables.load(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        val tot = cnt.agg(sum(col("n")).as("total"), count(lit(1)).as("n_vocab"))
        val top = cnt.orderBy(col("n").desc, col("token")).limit(1000)
          .withColumn("rank",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("n").desc, col("token"))))
        val ks = Seq(10, 100, 1000)
        ks.map { k =>
          top.filter(col("rank") <= k)
            .agg(sum(col("n")).as("covered"))
            .withColumn("k", lit(k.toLong))
        }.reduce(_ unionByName _)
          .crossJoin(broadcast(tot))
          .select(col("k"), col("covered"), col("total"), col("n_vocab"),
            (col("covered").cast("double") / col("total").cast("double"))
              .as("coverage"))
          .orderBy("k")
      },
      oracle = Some(
        """WITH ex AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
          |cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY token),
          |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
          |               CAST(COUNT(*) AS BIGINT) AS n_vocab FROM cnt),
          |rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank FROM cnt
          |       QUALIFY rank <= 1000),
          |ks(k) AS (VALUES (CAST(10 AS BIGINT)), (CAST(100 AS BIGINT)),
          |                 (CAST(1000 AS BIGINT))),
          |g AS (SELECT k, CAST(SUM(CASE WHEN rank <= k THEN n ELSE 0 END) AS BIGINT)
          |               AS covered
          |      FROM rk CROSS JOIN ks GROUP BY k)
          |SELECT k, covered, total, n_vocab,
          |       CAST(covered AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
          |FROM g CROSS JOIN tot ORDER BY k""".stripMargin)),

    // ---- Good–Turing unseen mass + Chao1 richness (added r8) -------------
    // The two classical "how much vocabulary haven't we seen" estimators,
    // per source, from one count-of-counts pass:
    //   - Good–Turing missing mass p₀ = N₁/N (hapax share of token mass) —
    //     the probability the NEXT token drawn from this source is a type
    //     never seen before; high p₀ = the crawl is nowhere near lexical
    //     saturation (keep crawling), near-zero = saturated (the Zipf tail
    //     is exhausted; more data adds repetition, not coverage).
    //   - Chao1 richness V̂ = V + N₁²/(2·N₂) — the abundance-based lower
    //     bound on TOTAL vocabulary size including unseen types; V̂/V far
    //     above 1 says the observed type inventory badly undercounts the
    //     domain. The forward-looking complement of heaps_law_fit (which
    //     fits observed growth; Chao1 estimates the asymptote).
    // Float parity: both are exact-integer sufficient statistics (N, V,
    // N₁, N₂) with ONE bare division each — chao1 emits the common-
    // denominator form (2·N₂·V + N₁²)/(2·N₂) so no float add follows the
    // division; N₂ = 0 yields NULL (the estimator is undefined, not ∞).
    //
    // Scale shape: ONE corpus token pass → (source, tok) agg with map-side
    // combine → a ≤|sources| roll-up. Nothing corpus-sized after the agg.
    "vocab_richness" -> Q(
      fn = (s, dir) => {
        val c = Tables.load(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        c.groupBy("source").agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            col("n_hapax"), col("n_dis"),
            (col("n_hapax").cast("double") / col("n_tokens").cast("double"))
              .as("unseen_mass"),
            when(col("n_dis") > 0,
              (lit(2L) * col("n_dis") * col("n_types")
                + col("n_hapax") * col("n_hapax")).cast("double")
                / (lit(2L) * col("n_dis")).cast("double")).as("chao1"))
          .orderBy("source")
      },
      oracle = Some(
        """WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
          |c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY source, tok),
          |g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |             CAST(COUNT(*) AS BIGINT) AS n_types,
          |             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
          |             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
          |      FROM c GROUP BY source)
          |SELECT source, n_tokens, n_types, n_hapax, n_dis,
          |       CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unseen_mass,
          |       CASE WHEN n_dis > 0
          |            THEN CAST(2 * n_dis * n_types + n_hapax * n_hapax AS DOUBLE)
          |                 / CAST(2 * n_dis AS DOUBLE) END AS chao1
          |FROM g ORDER BY source""".stripMargin)),

    // ---- per-source length distribution ----------------------------------
    // Exact R-7 interpolated quantiles of document length — the curation
    // dashboard's "is this source's length profile sane" primitive. Both
    // sides SPELL OUT the same interpolation over the same sorted array —
    // pos = p·(n−1), v = lo + (pos − ⌊pos⌋)·(hi − lo) — instead of trusting
    // the engines' builtins to share an expression tree (Spark's Percentile
    // computes the weighted two-product form, DuckDB's quantile_cont the
    // lerp form: mathematically equal, but 1-ulp apart on adversarial
    // inputs, which a 6 dp rounding boundary could expose). Scale note:
    // sort_array over a per-SOURCE group is fine (thousands of groups ×
    // bounded lengths); for billions of rows per group switch to
    // percentile_approx and a tolerance-checked oracle.
    "length_quantiles" -> Q(
      fn = (s, dir) => {
        // Spark [] is 0-based (DuckDB's is 1-based — its side adds 1)
        def q(p: Double, name: String) = Q.grid6(expr(
          s"""lens[int(floor($p * (size(lens) - 1)))]
             |+ ($p * (size(lens) - 1) - floor($p * (size(lens) - 1)))
             |  * (lens[int(ceil($p * (size(lens) - 1)))]
             |     - lens[int(floor($p * (size(lens) - 1)))])""".stripMargin))
          .as(name)
        Tables.load(s, dir, "documents")
          .groupBy("source")
          .agg(sort_array(collect_list(col("n_chars").cast("double"))).as("lens"))
          .select(col("source"),
            q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"), q(0.95, "p95"))
          .orderBy("source")
      },
      oracle = Some {
        def q(p: Double, name: String) =
          s"""floor((lens[CAST(floor($p * (len(lens) - 1)) AS INTEGER) + 1]
             |+ ($p * (len(lens) - 1) - floor($p * (len(lens) - 1)))
             |  * (lens[CAST(ceil($p * (len(lens) - 1)) AS INTEGER) + 1]
             |     - lens[CAST(floor($p * (len(lens) - 1)) AS INTEGER) + 1]))
             |  * 1000000.0) / 1000000.0 AS $name"""
            .stripMargin
        s"""WITH a AS (SELECT source,
           |             list_sort(list(CAST(n_chars AS DOUBLE))) AS lens
           |           FROM documents GROUP BY source)
           |SELECT source,
           |       ${q(0.25, "p25")}, ${q(0.5, "p50")},
           |       ${q(0.75, "p75")}, ${q(0.95, "p95")}
           |FROM a ORDER BY source""".stripMargin
      }),

    // ---- shingle novelty vs earlier corpus (added r6) --------------------
    // Per doc: the fraction of its distinct 5-token shingles first seen in
    // THIS doc (first = minimum doc_id over the corpus) — the novelty curve
    // behind dataset-ordering / incremental-crawl value estimates: novelty
    // ~1 is fresh content, ~0 is re-crawled boilerplate. Scale shape: ONE
    // shingle explode, one exchange — per-shingle first-seen is a window
    // minimum over the shingle partition (bounded by a shingle's document
    // frequency), not a min-agg joined back (which explodes the corpus
    // TWICE: the partial agg before the agg's exchange breaks canonical
    // equality, so ReusedExchange cannot dedup the two branches — measured
    // 2.06 → 1.3 s at sf0.1); per-doc roll-up carries two ints. Exact-int
    // ratio, one final correctly-rounded division.
    "ngram_novelty" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("s")
        Tables.load(s, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(graft.functions.ShingleFunctions.shingleSet(col("toks"), 5)).as("s"))
          .withColumn("fd", min(col("doc_id")).over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("fd") === col("doc_id"), 1).otherwise(0)).as("n_novel"))
          .withColumn("novelty",
            Q.grid6(col("n_novel").cast("double") / col("n_shingles")))
          .orderBy("doc_id")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |sh AS (SELECT doc_id, UNNEST($shingles5Duck) AS s
           |       FROM t WHERE len(toks) >= 5),
           |first_seen AS (SELECT s, MIN(doc_id) AS fd FROM sh GROUP BY s)
           |SELECT sh.doc_id, COUNT(*) AS n_shingles,
           |       CAST(SUM(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_novel,
           |       floor(CAST(SUM(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
           |             / COUNT(*) * 1000000.0) / 1000000.0 AS novelty
           |FROM sh JOIN first_seen f USING (s)
           |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)),

    // ---- per-source data card (added r6) ---------------------------------
    // The datasheet/data-card roll-up: one row per source with the release
    // metadata a dataset consumer reads first — doc count, exact-dup count
    // (docs minus distinct text digests, the dedup_exact headline), language
    // spread and dominant language, token volume, and mean doc length. One
    // corpus pass computes every per-doc input; the dominant language is a
    // deterministic (count DESC, lang ASC) rank over the tiny
    // (source, lang) table. Scale shape: one per-source hash agg (distinct
    // digest counting expands map-side like any count-distinct), a
    // (source, lang)-sized rank window, one join of two source-keyed tiny
    // tables. Exact-int everything; one final division.
    "source_datacard" -> Q(
      fn = (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("doc_id"),
            size(split(col("text"), " ")).as("n_toks"), md5(col("text")).as("digest"))
        val core = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            (count(lit(1)) - countDistinct(col("digest"))).as("n_dup_docs"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_toks")).as("n_tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n").desc, col("lang"))
        val topLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        core.join(topLang, Seq("source"))
          .withColumn("avg_tokens",
            Q.grid6(col("n_tokens").cast("double") / col("n_docs")))
          .select("source", "n_docs", "n_dup_docs", "n_langs", "top_lang",
            "n_tokens", "avg_tokens")
          .orderBy("source")
      },
      oracle = Some(
        """WITH d AS (SELECT source, lang, len(string_split(text, ' ')) AS n_toks,
          |                  md5(text) AS digest
          |           FROM documents),
          |core AS (SELECT source, COUNT(*) AS n_docs,
          |                COUNT(*) - COUNT(DISTINCT digest) AS n_dup_docs,
          |                COUNT(DISTINCT lang) AS n_langs,
          |                CAST(SUM(n_toks) AS BIGINT) AS n_tokens
          |         FROM d GROUP BY source),
          |lc AS (SELECT source, lang, COUNT(*) AS n FROM d GROUP BY source, lang),
          |tl AS (SELECT source, lang AS top_lang FROM (
          |         SELECT source, lang, ROW_NUMBER() OVER (
          |           PARTITION BY source ORDER BY n DESC, lang) AS rk FROM lc)
          |       WHERE rk = 1)
          |SELECT c.source, c.n_docs, c.n_dup_docs, c.n_langs, t.top_lang,
          |       c.n_tokens,
          |       floor(CAST(c.n_tokens AS DOUBLE) / c.n_docs * 1000000.0) / 1000000.0 AS avg_tokens
          |FROM core c JOIN tl t USING (source) ORDER BY c.source""".stripMargin))
  )
}

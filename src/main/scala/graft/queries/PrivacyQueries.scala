package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy-preserving release operators (§2.4 north-star surface, added r5).
  *
  * A training-data pipeline that exports usage reports or joins event data
  * across teams needs identifier hygiene: pseudonymize stable ids with a
  * salted hash, and SUPPRESS small groups (k-anonymity's first rule — a
  * pseudonym seen in only a handful of events is re-identifiable by its
  * activity pattern alone).
  */
object PrivacyQueries {

  /** Suppression threshold: users with fewer events than this are rolled
    * into one anonymous bucket instead of receiving a pseudonym. */
  private val K = 60

  /** PII span-class regexes, written in the COMMON dialect of Java regex
    * (Spark) and RE2 (DuckDB): character classes + greedy quantifiers only
    * — no lookaround, no backreference (RE2 supports neither), and
    * leftmost-greedy matching agrees between the engines on this fragment.
    * Order of application is a contract: URL → email → phone → residual
    * digits (URLs contain dots/digits the later classes would chew). */
  private val UrlPat = "https?://[A-Za-z0-9./_%?=&#-]+"
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+[0-9][0-9-]{5,}[0-9]"
  /** Dotted-quad shape (r14) — the standard release heuristic; octet-range
    * validation (≤ 255) would need alternation both engines support but a
    * release review treats ANY dotted quad as a leak candidate, so the
    * broad shape is the conservative gate. */
  private val IpPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  /** 16-digit PAN candidate (r14) — a match is only MASKED when its Luhn
    * checksum validates (pure integer arithmetic, below), so a random
    * 16-digit id is not over-masked. */
  private val CardPat = "[0-9]{16}"

  /** Luhn sum of the first `n` digits of string column `c` (1-indexed,
    * digits at ODD positions doubled — correct for a 16-digit PAN whose
    * check digit sits at even position 16), as a SQL expression string.
    * Exact integer arithmetic; both engines spell the identical CASE
    * chain. Callers must guard length (substring('' ...) casts fail under
    * ANSI). */
  private def luhnSumExpr(c: String, n: Int): String =
    s"""aggregate(sequence(1, $n), 0, (acc, i) -> acc + CASE WHEN i % 2 = 1
       |  THEN CASE WHEN CAST(substring($c, i, 1) AS INT) * 2 > 9
       |            THEN CAST(substring($c, i, 1) AS INT) * 2 - 9
       |            ELSE CAST(substring($c, i, 1) AS INT) * 2 END
       |  ELSE CAST(substring($c, i, 1) AS INT) END)""".stripMargin

  /** DuckDB twin of [[luhnSumExpr]]. */
  private def duckLuhnSum(c: String, n: Int): String =
    s"""list_sum(list_transform(range(1, ${n + 1}), i -> CASE WHEN i % 2 = 1
       |  THEN CASE WHEN CAST(substring($c, CAST(i AS INTEGER), 1) AS INTEGER) * 2 > 9
       |            THEN CAST(substring($c, CAST(i AS INTEGER), 1) AS INTEGER) * 2 - 9
       |            ELSE CAST(substring($c, CAST(i AS INTEGER), 1) AS INTEGER) * 2 END
       |  ELSE CAST(substring($c, CAST(i AS INTEGER), 1) AS INTEGER) END))""".stripMargin

  /** The deterministic release-text fixture + sequential masker chain
    * (r12, extended r14 with card/IP): adds to `df` the columns `blurb`
    * (the release text: props plus user_id-derived spans on interleaved
    * residue classes — uid%3 email, uid%5 phone, uid%7 URL, uid%9 IP,
    * uid%11 a Luhn-VALID 16-digit card, uid%13 a Luhn-INVALID one that
    * must NOT be masked), the masking intermediates `m1..m5` (URL → email
    * → phone → card → IP — the order contract; residual digits are the
    * caller's final scrub), and the sequential per-class counts
    * `nu/ne/np/nc/ni/nd`, each counted on the string the previous class
    * already masked so counts ≡ redactions by construction.
    *
    * Card masking is CONDITIONAL: the LEFTMOST 16-digit candidate is
    * Luhn-validated and only then literal-replaced — that leftmost-
    * candidate contract is what covers the uid % 143 == 0 rows, which
    * carry BOTH the Luhn-valid (uid%11) and Luhn-invalid (uid%13)
    * fixtures: the valid card renders first, so it is the candidate;
    * the invalid one stays unmasked and its digits flow to `nd`. Two
    * deliberate fine-print points of the contract: (1) `replace(m3,
    * cand, ...)` is a literal GLOBAL replace — if the validated
    * candidate string ever appeared twice in one row, both occurrences
    * would mask (the conservative direction for a release gate); (2)
    * `nc` is a per-row VALIDATED-CANDIDATE FLAG (0/1), not an
    * occurrence count — on this fixture corpus the two coincide because
    * the valid card renders exactly once per row. The valid fixture
    * card is lpad(uid, 15, '0') plus the computed Luhn check digit; the
    * invalid one shifts that digit by 5 (mod 10). */
  private[graft] def piiMasked(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val uid = col("user_id")
    val withCard = df
      .withColumn("card15", lpad(uid.cast("string"), 15, "0"))
      .withColumn("s15", expr(luhnSumExpr("card15", 15)))
      .withColumn("luhn_check", (lit(10) - col("s15") % 10) % 10)
    val blurb = concat(
      lit("note "), col("props"),
      when(uid % 3 === 0,
        concat(lit(" user"), uid.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(uid % 5 === 0,
        concat(lit(" tel +1-555-"),
          lpad((uid % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(uid % 7 === 0,
        concat(lit(" https://ex.example/u/"), uid.cast("string")))
        .otherwise(lit("")),
      when(uid % 9 === 0,
        concat(lit(" ip 10."), (uid % 256).cast("string"), lit(".0."),
          (uid % 100).cast("string")))
        .otherwise(lit("")),
      when(uid % 11 === 0,
        concat(lit(" card "), col("card15"), col("luhn_check").cast("string")))
        .otherwise(lit("")),
      when(uid % 13 === 0,
        concat(lit(" badcard "), col("card15"),
          ((col("luhn_check") + 5) % 10).cast("string")))
        .otherwise(lit("")))
    withCard.withColumn("blurb", blurb)
      .withColumn("m1", regexp_replace(col("blurb"), UrlPat, "<URL>"))
      .withColumn("m2", regexp_replace(col("m1"), EmailPat, "<EMAIL>"))
      .withColumn("m3", regexp_replace(col("m2"), PhonePat, "<PHONE>"))
      .withColumn("cand", regexp_extract(col("m3"), CardPat, 0))
      // CASE, not AND: the luhn casts must never evaluate on a no-match ''
      // candidate (ANSI cast error); CaseWhen is the guaranteed-lazy
      // construct on both engines
      .withColumn("card_ok",
        when(length(col("cand")) === 16,
          expr(luhnSumExpr("cand", 16)) % 10 === 0).otherwise(lit(false)))
      // literal replace of the VALIDATED candidate only — a regex replace
      // would also swallow a Luhn-invalid run sharing the row
      .withColumn("m4",
        when(col("card_ok"), expr("replace(m3, cand, '<CARD>')"))
          .otherwise(col("m3")))
      .withColumn("m5", regexp_replace(col("m4"), IpPat, "<IP>"))
      // r15: counts via regexp_count — the SAME non-overlapping-match count
      // as size(regexp_extract_all(...)), without materializing the match
      // array per row (this chain is the per-row hot path of a map-only
      // export; guide §1.2 per-task work). nd likewise drops the extra
      // regexp_replace + string alloc for a direct digit count. The DuckDB
      // twin keeps its len(regexp_extract_all) spelling — both count the
      // same matches.
      .withColumn("nu", regexp_count(col("blurb"), lit(UrlPat)).cast("long"))
      .withColumn("ne", regexp_count(col("m1"), lit(EmailPat)).cast("long"))
      .withColumn("np", regexp_count(col("m2"), lit(PhonePat)).cast("long"))
      .withColumn("nc", when(col("card_ok"), 1L).otherwise(0L))
      .withColumn("ni", regexp_count(col("m4"), lit(IpPat)).cast("long"))
      .withColumn("nd", regexp_count(col("m5"), lit("[0-9]")).cast("long"))
  }

  /** The shared PII span classifier (r13, +card/IP r14): for a frame
    * carrying `user_id`, `props`, and `event_type`, returns (event_type,
    * nu, ne, np, nc, ni, nd) — per-row span counts per class, counted
    * SEQUENTIALLY (each class on the string the previous class already
    * masked, the safe_export_spans contract). Shared by the batch
    * `pii_audit` gate and the streaming
    * [[graft.streaming.PriorityStreams.piiStream]] twin, so the live gate
    * and the post-hoc audit can never disagree about what a span is. */
  private[graft] def piiClassified(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    piiMasked(df).select(col("event_type"),
      col("nu"), col("ne"), col("np"), col("nc"), col("ni"), col("nd"))

  /** Oracle twin of [[piiMasked]] — CTE text ending in `c(event_id,
    * user_id, event_type, blurb, m1..m5, nu, ne, np, nc, ni, nd)`, shared
    * by safe_export_spans and pii_audit. */
  private def piiMaskSqlCtes: String =
    s"""b AS (
       |  SELECT event_id, user_id, event_type, props,
       |         lpad(CAST(user_id AS VARCHAR), 15, '0') AS card15
       |  FROM events),
       |b2 AS (
       |  SELECT *, (10 - (${duckLuhnSum("card15", 15)}) % 10) % 10 AS luhn_check
       |  FROM b),
       |b3 AS (
       |  SELECT event_id, user_id, event_type,
       |         'note ' || props ||
       |           CASE WHEN user_id % 3 = 0
       |                THEN ' user' || CAST(user_id AS VARCHAR) || '@example.com'
       |                ELSE '' END ||
       |           CASE WHEN user_id % 5 = 0
       |                THEN ' tel +1-555-' || lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0')
       |                ELSE '' END ||
       |           CASE WHEN user_id % 7 = 0
       |                THEN ' https://ex.example/u/' || CAST(user_id AS VARCHAR)
       |                ELSE '' END ||
       |           CASE WHEN user_id % 9 = 0
       |                THEN ' ip 10.' || CAST(user_id % 256 AS VARCHAR) ||
       |                     '.0.' || CAST(user_id % 100 AS VARCHAR)
       |                ELSE '' END ||
       |           CASE WHEN user_id % 11 = 0
       |                THEN ' card ' || card15 || CAST(luhn_check AS VARCHAR)
       |                ELSE '' END ||
       |           CASE WHEN user_id % 13 = 0
       |                THEN ' badcard ' || card15 || CAST((luhn_check + 5) % 10 AS VARCHAR)
       |                ELSE '' END
       |         AS blurb
       |  FROM b2),
       |s1 AS (SELECT *, regexp_replace(blurb, '$UrlPat', '<URL>', 'g') AS m1 FROM b3),
       |s2 AS (SELECT *, regexp_replace(m1, '$EmailPat', '<EMAIL>', 'g') AS m2 FROM s1),
       |s3 AS (SELECT *, regexp_replace(m2, '$PhonePat', '<PHONE>', 'g') AS m3 FROM s2),
       |s3c AS (SELECT *, regexp_extract(m3, '$CardPat') AS cand FROM s3),
       |s4 AS (SELECT *,
       |              CASE WHEN len(cand) = 16
       |                   THEN CASE WHEN (${duckLuhnSum("cand", 16)}) % 10 = 0
       |                             THEN TRUE ELSE FALSE END
       |                   ELSE FALSE END AS card_ok
       |       FROM s3c),
       |s5 AS (SELECT *, CASE WHEN card_ok THEN replace(m3, cand, '<CARD>')
       |                      ELSE m3 END AS m4
       |       FROM s4),
       |s6 AS (SELECT *, regexp_replace(m4, '$IpPat', '<IP>', 'g') AS m5 FROM s5),
       |c AS (SELECT event_id, user_id, event_type, blurb, m1, m2, m3, m4, m5,
       |             CAST(len(regexp_extract_all(blurb, '$UrlPat')) AS BIGINT) AS nu,
       |             CAST(len(regexp_extract_all(m1, '$EmailPat')) AS BIGINT) AS ne,
       |             CAST(len(regexp_extract_all(m2, '$PhonePat')) AS BIGINT) AS np,
       |             CAST(CASE WHEN card_ok THEN 1 ELSE 0 END AS BIGINT) AS nc,
       |             CAST(len(regexp_extract_all(m4, '$IpPat')) AS BIGINT) AS ni,
       |             CAST(length(m5) - length(regexp_replace(m5, '[0-9]', '', 'g')) AS BIGINT) AS nd
       |      FROM s6)""".stripMargin

  val all: Map[String, Q] = Map(

    // ---- k-anonymous pseudonymized usage report --------------------------
    // Per-user event counts where qualifying users (≥ K events) appear under
    // a salted-md5 pseudonym and everyone else is rolled into a single
    // suppressed row (pseudo NULL, user count + event count only) — the
    // release never carries a raw user_id. Scale shape: ONE hash agg on
    // user_id (partial+final, map-side combined), then a stateless
    // projection; the suppressed roll-up aggregates the tiny per-user frame,
    // not the event stream. Deterministic: the salt is a fixed literal, the
    // pseudonym is a pure function of user_id, and the total order is
    // (pseudo NULLS FIRST, n_events).
    "pseudonymize_events" -> Q(
      fn = (s, dir) => {
        val perUser = Tables.load(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val kept = perUser.filter(col("n_events") >= K)
          .select(
            substring(md5(concat(lit("graft-2026:"), col("user_id").cast("string"))), 1, 12)
              .as("pseudo"),
            lit(1L).as("n_users"), col("n_events"))
        // agg over a possibly-empty frame still yields the one roll-up row
        // (count 0, sum NULL → 0) — matching SQL aggregate semantics exactly
        val suppressed = perUser.filter(col("n_events") < K)
          .agg(count(lit(1)).as("n_users"),
            coalesce(sum(col("n_events")), lit(0L)).as("n_events"))
          .select(lit(null).cast("string").as("pseudo"),
            col("n_users"), col("n_events"))
        kept.unionByName(suppressed)
          .orderBy(col("pseudo").asc_nulls_first, col("n_events"))
      },
      oracle = Some(
        s"""WITH pu AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
           |kept AS (
           |  SELECT substring(md5('graft-2026:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudo,
           |         CAST(1 AS BIGINT) AS n_users, n_events
           |  FROM pu WHERE n_events >= $K),
           |sup AS (
           |  SELECT CAST(NULL AS VARCHAR) AS pseudo, COUNT(*) AS n_users,
           |         CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS n_events
           |  FROM pu WHERE n_events < $K)
           |SELECT * FROM kept
           |UNION ALL
           |SELECT * FROM sup
           |ORDER BY pseudo NULLS FIRST, n_events""".stripMargin)),

    // ---- event-level safe-export view (added r7) -------------------------
    // The row-level release the pseudonymized REPORT above aggregates away:
    // every event, export-ready — stable id replaced by the salted-md5
    // pseudonym, the free-text payload scrubbed of identifier-shaped spans
    // (every digit masked to '#', span lengths preserved so downstream
    // parsers keep their offsets; n_masked audits how much was redacted),
    // and the timestamp COARSENED to the hour (generalization, k-anonymity's
    // second tool: exact micros are a quasi-identifier — two "anonymous"
    // streams join on them trivially). Masking every digit is deliberately
    // blunt: a release gate errs toward over-redaction, and digits are the
    // common atom of phone/account/SSN-shaped spans.
    //
    // RELEASE CONTRACT caveats (r8, documented per advice — the behaviors
    // are kept for oracle parity, a production release tightens them):
    //   1. The pseudonym salt is deterministic and source-committed
    //      ('graft-2026:') over an enumerable numeric user_id, so the
    //      mapping is reversible by dictionary enumeration by anyone with
    //      the salt, and — because pseudonymize_events uses the SAME salt —
    //      this row-level export links 1:1 to that aggregate report.
    //      Production: a per-release secret salt (or keyed HMAC), rotated
    //      per export, never committed.
    //   2. Unlike pseudonymize_events, no K-suppression is applied here:
    //      a pseudonym with very few rows remains re-identifiable by its
    //      activity pattern. Production: carry the same K-threshold into
    //      the row-level export (suppress or generalize sparse pseudonyms).
    //   3. The scrub masks NUMERIC identifier spans only. Alphabetic
    //      identifier-shaped content (emails, handles, names) passes
    //      through untouched — extending the mask to email/handle regexes
    //      is deliberate future work because regex dialects diverge
    //      between engines (the oracle gate) and between regex engines in
    //      production; treat props_masked as digit-scrubbed, not PII-free.
    //
    // Scale shape: pure map-only projection — no shuffle at all before the
    // output sort; at 100 TB this runs at scan speed. DuckDB portability:
    // Spark's regexp_replace is global by default, DuckDB's needs the 'g'
    // flag — the oracle spells it.
    "safe_export" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .select(
            col("event_id"),
            substring(md5(concat(lit("graft-2026:"), col("user_id").cast("string"))), 1, 12)
              .as("pseudo"),
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"),
            regexp_replace(col("props"), "[0-9]", "#").as("props_masked"),
            (length(col("props")) - length(regexp_replace(col("props"), "[0-9]", "")))
              .as("n_masked"))
          .orderBy("event_id")
      },
      oracle = Some(
        """SELECT event_id,
          |       substring(md5('graft-2026:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudo,
          |       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
          |       event_type,
          |       regexp_replace(props, '[0-9]', '#', 'g') AS props_masked,
          |       CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS INTEGER) AS n_masked
          |FROM events ORDER BY event_id""".stripMargin)),

    // ---- reproducible Laplace-noised count release (added r7) ------------
    // The differential-privacy release shape for histogram queries: per
    // (event_type, day), the true count plus Laplace(b = 2) noise — the
    // ε = 0.5 mechanism for sensitivity-1 counts. The noise is SEEDED
    // (md5 of the group key → 24-bit uniform → inverse-CDF transform), so
    // the release is reproducible and the DuckDB oracle replays it exactly;
    // a production DP deployment swaps the seeded uniform for true
    // randomness and DROPS the `n` column — emitting both here is what
    // makes the mechanism auditable (and keeps the privacy/utility error
    // visible: |noisy − n| has mean b).
    //
    // Determinism machinery, all exactly portable:
    //   h    = first 6 md5 hex chars as an integer (strpos-ladder — DuckDB
    //          has no hex→int cast; lexicographic hex = numeric for fixed
    //          width, but the inverse CDF needs the VALUE);
    //   dev  = 2h − 2²⁴ ∈ (−2²⁴, 2²⁴)  (exact int, sign = coin);
    //   t    = max(2²⁴ − |dev|, 1)     (exact int — the max() floors the
    //          2⁻²⁴-probability t = 0 edge that would send ln to −∞);
    //   lap6 = −b · sign(dev) · ln6(t, 2²⁴) — the one ln is [[LnGrid]]'s
    //          fixed-point integer chain (r8: the rounded-libm grid was
    //          engine-build-dependent), scaled by exact ints;
    //   noisy = (n·10^6 + lap6) / 10^6, one bare division of an exact int.
    //
    // Scale shape: one (type, day) hash agg with map-side combine; the
    // noise is a stateless projection over the ≤ types×days group frame.
    "dp_noisy_counts" -> Q(
      fn = (s, dir) => {
        val H = 1 << 24
        val hexSum = (0 until 6).map { i =>
          s"(instr('0123456789abcdef', substring(dg, ${i + 1}, 1)) - 1) * ${1L << (4 * (5 - i))}"
        }.mkString(" + ")
        val base = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dg",
            md5(concat(lit("dp:"), col("event_type"), lit("|"), col("d").cast("string"))))
          .withColumn("h", expr(hexSum))
          .withColumn("dev", col("h") * 2 - lit(H.toLong))
          .withColumn("sgn",
            when(col("dev") > 0, 1L).when(col("dev") < 0, -1L).otherwise(0L))
          .withColumn("t", greatest(lit(H.toLong) - abs(col("dev")), lit(1L)))
        graft.queries.LnGrid.withLn6(base, col("t"), lit(H.toLong), "l6")
          .withColumn("lap6i", col("l6") * lit(-2L) * col("sgn"))
          .select(col("event_type"), col("d"), col("n"),
            ((col("n") * lit(1000000L) + col("lap6i")).cast("double")
              / lit(1000000.0d)).as("noisy"))
          .orderBy("event_type", "d")
      },
      oracle = Some {
        val H = 1 << 24
        val hexSum = (0 until 6).map { i =>
          s"(strpos('0123456789abcdef', substring(dg, ${i + 1}, 1)) - 1) * ${1L << (4 * (5 - i))}"
        }.mkString("\n          |         + ")
        s"""WITH g AS (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
           |           FROM events GROUP BY 1, 2),
           |dg AS (SELECT event_type, d, n,
           |              md5('dp:' || event_type || '|' || CAST(d AS VARCHAR)) AS dg
           |       FROM g),
           |hv AS (SELECT event_type, d, n,
           |         $hexSum AS h
           |       FROM dg),
           |nz AS (SELECT event_type, d, CAST(n AS BIGINT) AS n, h * 2 - $H AS dev,
           |              CAST(greatest($H - abs(h * 2 - $H), 1) AS BIGINT) AS t
           |       FROM hv),
           |${graft.queries.LnGrid.sqlCtes("nz", "t", H.toString, "l6", "dp_")},
           |lp AS (SELECT event_type, d, n,
           |              l6 * (-2) * (CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END) AS lap6i
           |       FROM dp_out)
           |SELECT event_type, d, n,
           |       CAST(n * 1000000 + lap6i AS DOUBLE) / 1000000.0 AS noisy
           |FROM lp ORDER BY event_type, d""".stripMargin
      }),

    // ---- span-class masking export (added r12) ----------------------------
    // Closes safe_export's documented caveat 3 (the r11 verdict's #1
    // remaining privacy hole): alphabetic identifier-shaped spans — emails,
    // URLs, phone numbers — now mask to typed tokens (<EMAIL>/<URL>/<PHONE>)
    // BEFORE the blunt digit scrub, so a release consumer can distinguish
    // "a contact address was here" from "a number was here" and the digit
    // mask no longer shreds the inside of an email/URL into un-parseable
    // rubble. Masking order matters and is part of the contract: URL first
    // (URLs contain digits and dots that the later classes would chew),
    // then email, then phone, then residual digits → '#'. Per-row audit
    // counts are computed SEQUENTIALLY on the same intermediate strings the
    // masks saw, so n_url/n_email/n_phone/n_digit always sum to exactly
    // what was redacted.
    //
    // The span classes are detected with regexes written in the COMMON
    // dialect of Java regex (Spark) and RE2 (DuckDB) — character classes +
    // greedy quantifiers only, no lookaround/backreference (RE2 has
    // neither); leftmost-greedy semantics agree between the engines for
    // this fragment, which is what makes the masker oracle-checkable at
    // all (the r8 caveat deferred exactly this).
    //
    // FIXTURE NOTE: the synthetic events.props carries no natural
    // email/URL/phone/IP/card spans (measured: zero matches corpus-wide),
    // which would make the gate vacuous. The query therefore builds its
    // release text deterministically from the row itself — props plus
    // user_id-derived contact spans on interleaved residue classes
    // (uid%3 → email, uid%5 → phone, uid%7 → URL, uid%9 → IPv4, uid%11 →
    // a Luhn-VALID card, uid%13 → a Luhn-INVALID card that must NOT be
    // masked; the decontaminate doc_id%97 precedent) — so every class,
    // every overlap combination, and the no-span case are all exercised
    // and the DuckDB twin replays the identical construction. r14 adds
    // the card/IP classes (VERDICT item 5): masking order extends to
    // URL → email → phone → card (Luhn-gated, leftmost candidate) →
    // IPv4 → residual digits, all via the shared [[piiMasked]] chain.
    //
    // Scale shape: pure map-only projection (regex per row, no shuffle
    // before the output sort) — scan speed at 100 TB, embarrassingly
    // partition-parallel.
    "safe_export_spans" -> Q(
      fn = (s, dir) => {
        val m = piiMasked(Tables.load(s, dir, "events"))
        m.select(
            col("event_id"),
            substring(md5(concat(lit("graft-2026:"), col("user_id").cast("string"))), 1, 12)
              .as("pseudo"),
            regexp_replace(col("m5"), "[0-9]", "#").as("text_masked"),
            col("nu").as("n_url"), col("ne").as("n_email"),
            col("np").as("n_phone"), col("nc").as("n_card"),
            col("ni").as("n_ip"), col("nd").as("n_digit"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""WITH $piiMaskSqlCtes
           |SELECT event_id,
           |       substring(md5('graft-2026:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudo,
           |       regexp_replace(m5, '[0-9]', '#', 'g') AS text_masked,
           |       nu AS n_url, ne AS n_email, np AS n_phone,
           |       nc AS n_card, ni AS n_ip, nd AS n_digit
           |FROM c ORDER BY event_id""".stripMargin)),

    // ---- PII release-gate audit (added r12) --------------------------------
    // The aggregate gate a privacy review runs BEFORE approving
    // safe_export_spans' row-level release: per event type — rows scanned,
    // rows carrying each span class (email/phone/URL/card/IP — card/IP
    // added r14, Luhn-gated card counting), total spans per class,
    // residual digit characters that the typed masks did NOT absorb,
    // and the clean-row share (no span of any class AND no residual digit —
    // ONE bare division of exact counts). A release rule reads one number
    // per class: "n_email_rows must be 0 after masking" is checkable
    // against text_masked; this audit reports it against the PRE-mask text
    // so the reviewer sees what the masker is up against. Same sequential
    // counting discipline as the masker (each class counted on the string
    // the previous class already masked), so the two operators can never
    // disagree about what a span is.
    //
    // Scale shape: map-side regex + per-type partial agg — collapses to
    // ≤|types| rows before the one shuffle; scan-bound at 100 TB.
    "pii_audit" -> Q(
      fn = (s, dir) => {
        piiClassified(Tables.load(s, dir, "events"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("ne") > 0, 1L).otherwise(0L)).as("rows_email"),
            sum(when(col("np") > 0, 1L).otherwise(0L)).as("rows_phone"),
            sum(when(col("nu") > 0, 1L).otherwise(0L)).as("rows_url"),
            sum(when(col("nc") > 0, 1L).otherwise(0L)).as("rows_card"),
            sum(when(col("ni") > 0, 1L).otherwise(0L)).as("rows_ip"),
            sum(col("ne")).as("n_email"),
            sum(col("np")).as("n_phone"),
            sum(col("nu")).as("n_url"),
            sum(col("nc")).as("n_card"),
            sum(col("ni")).as("n_ip"),
            sum(col("nd")).as("n_digit_residual"),
            sum(when(col("ne") === 0 && col("np") === 0 && col("nu") === 0
              && col("nc") === 0 && col("ni") === 0
              && col("nd") === 0, 1L).otherwise(0L)).as("rows_clean"))
          .withColumn("share_clean",
            col("rows_clean").cast("double") / col("n_rows").cast("double"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH $piiMaskSqlCtes
           |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_email,
           |       CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_phone,
           |       CAST(SUM(CASE WHEN nu > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_url,
           |       CAST(SUM(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_card,
           |       CAST(SUM(CASE WHEN ni > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_ip,
           |       CAST(SUM(ne) AS BIGINT) AS n_email,
           |       CAST(SUM(np) AS BIGINT) AS n_phone,
           |       CAST(SUM(nu) AS BIGINT) AS n_url,
           |       CAST(SUM(nc) AS BIGINT) AS n_card,
           |       CAST(SUM(ni) AS BIGINT) AS n_ip,
           |       CAST(SUM(nd) AS BIGINT) AS n_digit_residual,
           |       CAST(SUM(CASE WHEN ne = 0 AND np = 0 AND nu = 0 AND nc = 0
           |                      AND ni = 0 AND nd = 0
           |                THEN 1 ELSE 0 END) AS BIGINT) AS rows_clean,
           |       CAST(SUM(CASE WHEN ne = 0 AND np = 0 AND nu = 0 AND nc = 0
           |                      AND ni = 0 AND nd = 0
           |                THEN 1 ELSE 0 END) AS DOUBLE)
           |         / CAST(COUNT(*) AS DOUBLE) AS share_clean
           |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- k-anonymity audit (added r10) --------------------------------------
    // The release-gate beside safe_export's masking: under the quasi-
    // identifier (event_type, day) — the granularity safe_export actually
    // publishes — how identifiable is each row? A cell of size k means any
    // row in it hides among k; cells with k < 5 fail the classic k ≥ 5
    // release rule. Reported per event type: cell count, the minimum k,
    // how many cells and rows sit below 5, and the failing-row share (ONE
    // bare division). The number a privacy review asks for FIRST, computed
    // before any generalization decision.
    //
    // Scale shape: one (type, day) hash agg with map-side combine (the
    // cell frame is calendar × types bounded) → ≤|types| roll-up.
    "k_anonymity_audit" -> Q(
      fn = (s, dir) => {
        val cells = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("k"))
        cells.groupBy("event_type")
          .agg(count(lit(1)).as("n_cells"), sum(col("k")).as("n_rows"),
            min(col("k")).as("min_k"),
            sum(when(col("k") < 5, 1L).otherwise(0L)).as("cells_lt5"),
            sum(when(col("k") < 5, col("k")).otherwise(0L)).as("rows_lt5"))
          .select(col("event_type"), col("n_cells"), col("n_rows"), col("min_k"),
            col("cells_lt5"), col("rows_lt5"),
            (col("rows_lt5").cast("double") / col("n_rows").cast("double"))
              .as("share_rows_lt5"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH cells AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS k
          |  FROM events GROUP BY event_type, CAST(ts AS DATE))
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |       CAST(SUM(k) AS BIGINT) AS n_rows,
          |       CAST(MIN(k) AS BIGINT) AS min_k,
          |       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS cells_lt5,
          |       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_lt5,
          |       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
          |         / CAST(SUM(k) AS DOUBLE) AS share_rows_lt5
          |FROM cells GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- l-diversity audit (added r11) -----------------------------------
    // k_anonymity_audit's stronger sibling (Machanavajjhala 2007): a cell
    // can satisfy k ≥ 5 and STILL leak if every row in it shares the same
    // sensitive value — homogeneity attack. Under the same published
    // quasi-identifier (event_type, day), the sensitive attribute is the
    // whole-unit spend band floor(value): per type — cell count, the
    // minimum distinct-sensitive count l, cells and rows below the classic
    // l ≥ 3 rule, failing-row share (ONE bare division). Together the two
    // audits answer "is any published cell small" AND "is any published
    // cell uniform".
    //
    // Scale shape: one (type, day, band) distinct-collapse agg → one
    // (type, day) cell agg (calendar × types bounded) → ≤|types| roll-up.
    "l_diversity_audit" -> Q(
      fn = (s, dir) => {
        val cells = Tables.load(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("d"),
            floor(col("value")).cast("long").as("sens"))
          .groupBy("event_type", "d")
          .agg(count(lit(1)).as("k"), countDistinct(col("sens")).as("l"))
        cells.groupBy("event_type")
          .agg(count(lit(1)).as("n_cells"), min(col("l")).as("min_l"),
            sum(when(col("l") < 3, 1L).otherwise(0L)).as("cells_lt3"),
            sum(when(col("l") < 3, col("k")).otherwise(0L)).as("rows_lt3"),
            sum(col("k")).as("n_rows"))
          .select(col("event_type"), col("n_cells"), col("min_l"),
            col("cells_lt3"), col("rows_lt3"),
            (col("rows_lt3").cast("double") / col("n_rows").cast("double"))
              .as("share_rows_lt3"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH cells AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d,
          |         CAST(COUNT(*) AS BIGINT) AS k,
          |         CAST(COUNT(DISTINCT CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS l
          |  FROM events GROUP BY event_type, CAST(ts AS DATE))
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |       CAST(MIN(l) AS BIGINT) AS min_l,
          |       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS cells_lt3,
          |       CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT) AS rows_lt3,
          |       CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS DOUBLE)
          |         / CAST(SUM(k) AS DOUBLE) AS share_rows_lt3
          |FROM cells GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- t-closeness audit: the third leg of the release-gate triad (r12) -
    // k_anonymity_audit bounds group SIZE, l_diversity_audit bounds
    // sensitive-value VARIETY; t-closeness (Li, Li & Venkatasubramanian
    // 2007) bounds what a class's sensitive DISTRIBUTION reveals: even a
    // diverse cell leaks if its distribution sits far from the global one
    // (skewness attack — "this cell is 90% high-value where the table is
    // 10%"). Same cells as l_diversity (quasi-identifiers event_type x day,
    // sensitive floor(value)); distance = EMD over the ORDERED value
    // domain = gap-weighted L1 between the cell CDF and the global CDF
    // (emd_source_lengths' exact integer spelling: |fa·N − cf·k| · gap,
    // DECIMAL/HUGEINT), normalized by (k·N·span) so t ∈ [0,1]. Per type:
    // worst cell t, cells/rows above t = 0.2, violating-row share (ONE
    // bare division).
    //
    // Scale shape: one (type, day, sens) agg → cells x broadcast value-
    // domain grid (≤ cells·|domain|, both audit-bounded: calendar x type
    // cells, ingest-contract value domain — R1-whitelisted) → cell-
    // PARTITIONED cumulative windows → per-cell agg → ≤|types| roll-up.
    // The global-grid CDF window is value-domain bounded (R2, the
    // emd_source_lengths argument).
    "t_closeness_audit" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("d"),
            expr("cast(floor(value) as long)").as("sens"))
        val cellSens = ev.groupBy("event_type", "d", "sens")
          .agg(count(lit(1)).as("c"))
        val cells = cellSens.groupBy("event_type", "d").agg(sum(col("c")).as("k"))
        val gridG = cellSens.groupBy("sens").agg(sum(col("c")).as("ct"))
        val wv = Window.orderBy(col("sens"))
        val corp = gridG.select(col("sens"),
          sum(col("ct")).over(wv).as("cf"),
          (lead(col("sens"), 1).over(wv) - col("sens")).as("gap"))
        val tot = ev.agg(count(lit(1)).as("nn"),
          (max(col("sens")) - min(col("sens"))).as("span"))
        val wcell = Window.partitionBy(col("event_type"), col("d")).orderBy(col("sens"))
        val perCell = cells.crossJoin(broadcast(corp))
          .join(cellSens, Seq("event_type", "d", "sens"), "left")
          .na.fill(0L, Seq("c"))
          .withColumn("fa", sum(col("c")).over(wcell))
          .filter(col("gap").isNotNull)
          .crossJoin(broadcast(tot))
          .groupBy(col("event_type"), col("d"), col("k"), col("nn"), col("span"))
          .agg(sum(abs(big(col("fa")) * big(col("nn")) - big(col("cf")) * big(col("k")))
            * big(col("gap"))).as("tnum"))
          .withColumn("t", col("tnum").cast("double")
            / (big(col("k")) * big(col("nn")) * big(col("span"))).cast("double"))
        perCell.groupBy("event_type")
          .agg(count(lit(1)).as("n_cells"), max(col("t")).as("max_t"),
            sum(when(col("t") > 0.2, 1L).otherwise(0L)).as("cells_gt02"),
            sum(when(col("t") > 0.2, col("k")).otherwise(0L)).as("rows_gt02"),
            sum(col("k")).as("n_rows"))
          .select(col("event_type"), col("n_cells"), col("max_t"),
            col("cells_gt02"), col("rows_gt02"),
            (col("rows_gt02").cast("double") / col("n_rows").cast("double"))
              .as("share_rows_gt02"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d,
          |                   CAST(FLOOR(value) AS BIGINT) AS sens
          |            FROM events),
          |cs AS (SELECT event_type, d, sens, CAST(COUNT(*) AS BIGINT) AS c
          |       FROM ev GROUP BY event_type, d, sens),
          |cells AS (SELECT event_type, d, CAST(SUM(c) AS BIGINT) AS k
          |          FROM cs GROUP BY event_type, d),
          |gridg AS (SELECT sens, CAST(SUM(c) AS BIGINT) AS ct FROM cs GROUP BY sens),
          |corp AS (SELECT sens, SUM(ct) OVER (ORDER BY sens) AS cf,
          |                LEAD(sens) OVER (ORDER BY sens) - sens AS gap
          |         FROM gridg),
          |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
          |               CAST(MAX(sens) - MIN(sens) AS BIGINT) AS span
          |        FROM ev),
          |dense AS (SELECT cl.event_type, cl.d, cl.k, g.sens, g.cf, g.gap,
          |                 SUM(COALESCE(cs.c, 0)) OVER (PARTITION BY cl.event_type, cl.d
          |                                              ORDER BY g.sens) AS fa
          |          FROM cells cl CROSS JOIN corp g
          |          LEFT JOIN cs ON cs.event_type = cl.event_type
          |                      AND cs.d = cl.d AND cs.sens = g.sens),
          |pc AS (SELECT event_type, d, k, nn, span,
          |              SUM(abs(CAST(fa AS HUGEINT) * nn - CAST(cf AS HUGEINT) * k)
          |                  * gap) AS tnum
          |       FROM dense CROSS JOIN tot WHERE gap IS NOT NULL
          |       GROUP BY event_type, d, k, nn, span),
          |pt AS (SELECT event_type, d, k,
          |              CAST(tnum AS DOUBLE)
          |                / CAST(CAST(k AS HUGEINT) * nn * span AS DOUBLE) AS t
          |       FROM pc)
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
          |       MAX(t) AS max_t,
          |       CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS cells_gt02,
          |       CAST(SUM(CASE WHEN t > 0.2 THEN k ELSE 0 END) AS BIGINT) AS rows_gt02,
          |       CAST(SUM(CASE WHEN t > 0.2 THEN k ELSE 0 END) AS DOUBLE)
          |         / CAST(SUM(k) AS DOUBLE) AS share_rows_gt02
          |FROM pt GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}

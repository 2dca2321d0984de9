package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence analytics (§2.2/§2.4, added r5) — the consumer-side verbs
  * of the reference's event domain (its buckets exist to prioritize exactly
  * these event streams: reference README.md:9-17): ordered funnels and
  * cohort retention.
  *
  * Both are strict event-time semantics: a funnel step counts only if it
  * happens AFTER the user's previous step (min-ts per step, joined forward),
  * and retention day-k means activity inside [t0+k, t0+k+1) relative to the
  * user's own first event, not a calendar bucket.
  */
object FunnelQueries {

  /** Per-user transition multiplicities `(user_id, cur, nxt, c)` in strict
    * (ts, event_id) order — the shared head of event_seq_logprob and the
    * streaming model supply. */
  private[graft] def userTransitionCounts(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("user_id", "cur", "nxt").agg(count(lit(1)).as("c"))
  }

  /** The MLE transition model `(cur, nxt, lp6)` on [[LnGrid]]'s integer
    * 10^-6 ln grid — SHARED by the batch event_seq_logprob scorer and the
    * streaming [[graft.streaming.PriorityStreams.seqScoreStream]] model
    * supply (the r8 supply-chain pin: one construction, both legs). */
  private[graft] def transitionModelLn6(
      ut: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = ut.groupBy("cur", "nxt").agg(sum(col("c")).as("cpc"))
    val tot = p.groupBy("cur").agg(sum(col("cpc")).as("cp"))
    LnGrid.withLn6(p.join(broadcast(tot), Seq("cur")), col("cpc"), col("cp"), "lp6")
      .select(col("cur"), col("nxt"), col("lp6"))
  }

  // ---- Markov removal-effect attribution (added r8) ------------------------
  // Channel/state lists shared by the Spark leg and the generated oracle SQL
  // so the two cannot drift. Channels are the non-purchase event types — a
  // config-scale set, pinned like bm25_topk's fixed query list; START is the
  // journey-origin state, CONV/NULL the absorbers.
  private val AmChannels = Seq("click", "error", "signup", "view")
  private val AmStates = "START" +: AmChannels
  private val AmIters = 12

  /** Generated DuckDB oracle for attribution_markov: journey edges →
    * integer transition grid → coefficient pivot → [[AmIters]] unrolled
    * matrix-vector CTEs (the textrank unrolling discipline). */
  private def amOracleSql: String = {
    val coefDefs = AmStates.zipWithIndex.flatMap { case (st, i) =>
      AmChannels.zipWithIndex.map { case (ch, j) =>
        s"CAST(COALESCE(SUM(CASE WHEN from_s = '$st' AND to_s = '$ch' THEN p6 END), 0) AS BIGINT) AS p_${i}_${j + 1}"
      } :+
        s"CAST(COALESCE(SUM(CASE WHEN from_s = '$st' AND to_s = 'CONV' THEN p6 END), 0) AS BIGINT) AS pc_$i"
    }.mkString(",\n       ")
    val maskCols = (for {
      (_, i) <- AmStates.zipWithIndex
      (ch, j) <- AmChannels.zipWithIndex
    } yield s"CASE WHEN removed = '$ch' THEN 0 ELSE p_${i}_${j + 1} END AS p_${i}_${j + 1}")
      .mkString(",\n       ")
    val pcKeep = AmStates.indices.map(i => s"pc_$i").mkString(", ")
    val coefList = (AmStates.indices.flatMap(i =>
      AmChannels.indices.map(j => s"p_${i}_${j + 1}")) ++
      AmStates.indices.map(i => s"pc_$i")).mkString(", ")
    val iters = (1 to AmIters).map { k =>
      val vs = AmStates.indices.map { i =>
        val terms = AmChannels.indices.map(j => s"p_${i}_${j + 1} * v_${j + 1}").mkString(" + ")
        s"($terms + pc_$i * 1000000) // 1000000 AS v_$i"
      }.mkString(",\n          ")
      s"it$k AS (SELECT removed, $coefList,\n          $vs\n        FROM it${k - 1})"
    }.mkString(",\n")
    s"""WITH j AS (SELECT user_id, ts, event_id, event_type,
       |        CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS jid
       |      FROM events),
       |st AS (SELECT user_id, jid, event_type,
       |              COALESCE(LAG(event_type) OVER (PARTITION BY user_id, jid ORDER BY ts, event_id),
       |                       'START') AS from_s,
       |              CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS to_s,
       |              ROW_NUMBER() OVER (PARTITION BY user_id, jid ORDER BY ts DESC, event_id DESC) AS rd,
       |              MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |                OVER (PARTITION BY user_id, jid) AS hp
       |       FROM j),
       |edges AS (SELECT from_s, to_s FROM st
       |          UNION ALL
       |          SELECT event_type, 'NULL' FROM st WHERE rd = 1 AND hp = 0),
       |ec AS (SELECT from_s, to_s, CAST(COUNT(*) AS BIGINT) AS c FROM edges GROUP BY 1, 2),
       |tt AS (SELECT from_s, CAST(SUM(c) AS BIGINT) AS tot FROM ec GROUP BY 1),
       |ep AS (SELECT ec.from_s, ec.to_s, (c * 1000000) // tot AS p6
       |       FROM ec JOIN tt USING (from_s)),
       |cf AS (SELECT $coefDefs FROM ep),
       |vr(removed) AS (VALUES ('none'), ${AmChannels.map(c => s"('$c')").mkString(", ")}),
       |c0 AS (SELECT removed,
       |       $maskCols,
       |       $pcKeep FROM cf CROSS JOIN vr),
       |it0 AS (SELECT removed, $coefList,
       |        ${AmStates.indices.map(i => s"CAST(0 AS BIGINT) AS v_$i").mkString(", ")}
       |        FROM c0),
       |$iters,
       |bs AS (SELECT v_0 AS base6 FROM it12 WHERE removed = 'none'),
       |rm AS (SELECT removed AS channel, v_0 AS rem6 FROM it12 WHERE removed <> 'none'),
       |tr AS (SELECT CAST(COALESCE(SUM(base6 - rem6), 0) AS BIGINT) AS t FROM rm CROSS JOIN bs)
       |SELECT channel,
       |       CAST(base6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS base_conv,
       |       CAST(rem6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS removed_conv,
       |       CAST(base6 - rem6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS removal_effect,
       |       CASE WHEN t > 0 THEN CAST(base6 - rem6 AS DOUBLE) / CAST(t AS DOUBLE) END AS share
       |FROM rm CROSS JOIN bs CROSS JOIN tr ORDER BY channel""".stripMargin
  }

  val all: Map[String, Q] = Map(

    // ---- market-basket lift on daily event baskets (added r7) ------------
    // Classic association mining over behavioral "baskets": a basket is the
    // set of DISTINCT event types a user fires on one day; for every type
    // pair (a < b) with co-occurrence ≥ 20 baskets, report support and
    // lift = P(a,b)/(P(a)·P(b)) — lift > 1 means the behaviors travel
    // together (the cross-sell / co-trigger signal next to
    // transition_matrix's sequential view). Exact arithmetic: support is
    // one bare division; lift's numerator c_ab·n and denominator c_a·c_b
    // are exact DECIMAL(38,0) products, ONE division between them.
    //
    // Scale shape: basket membership is one distinct agg on (user, day,
    // type); the pair self-join fans out ≤ |types|² rows per basket (the
    // value domain, not the data); item counts (≤ |types| rows) broadcast;
    // the 1-row basket total is PlanGuard R1-whitelisted.
    "basket_lift" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val b = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
          .distinct()
        val n = b.select("user_id", "d").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        val item = b.groupBy("event_type").agg(count(lit(1)).as("ci"))
        val pairs = b.select(col("user_id"), col("d"), col("event_type").as("a"))
          .join(b.select(col("user_id"), col("d"), col("event_type").as("b")),
            Seq("user_id", "d"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 20)
        pairs
          .join(broadcast(item.select(col("event_type").as("a"), col("ci").as("c_a"))), Seq("a"))
          .join(broadcast(item.select(col("event_type").as("b"), col("ci").as("c_b"))), Seq("b"))
          .crossJoin(broadcast(n))
          .select(col("a"), col("b"), col("c_ab"),
            (col("c_ab").cast("double") / col("n_baskets").cast("double")).as("support"),
            ((big(col("c_ab")) * big(col("n_baskets"))).cast("double")
              / (big(col("c_a")) * big(col("c_b"))).cast("double")).as("lift"))
          .orderBy("a", "b")
      },
      oracle = Some(
        """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
          |      FROM (SELECT DISTINCT user_id, d FROM b)),
          |item AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ci FROM b GROUP BY event_type),
          |p AS (SELECT x.event_type AS a, y.event_type AS b, CAST(COUNT(*) AS BIGINT) AS c_ab
          |      FROM b x JOIN b y ON x.user_id = y.user_id AND x.d = y.d
          |                       AND x.event_type < y.event_type
          |      GROUP BY 1, 2 HAVING COUNT(*) >= 20)
          |SELECT a, b, c_ab,
          |       CAST(c_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
          |       CAST(CAST(c_ab AS HUGEINT) * n_baskets AS DOUBLE)
          |         / CAST(CAST(ia.ci AS HUGEINT) * ib.ci AS DOUBLE) AS lift
          |FROM p JOIN item ia ON ia.event_type = a
          |       JOIN item ib ON ib.event_type = b
          |       CROSS JOIN n
          |ORDER BY a, b""".stripMargin)),

    // ---- last-touch attribution (added r7) -------------------------------
    // The marketing-analytics staple the funnel family was missing: each
    // purchase is attributed to the user's most recent click within a
    // 7-day lookback (strictly before the purchase — the last-touch rule).
    // Reported per purchase day: how many purchases, how many attributed.
    // The carry-forward is the q_ignore_nulls LAST_VALUE idiom over a
    // trailing frame; all arithmetic is integer micros.
    //
    // Scale shape: ONE user_id exchange for the carry-forward window, then
    // a calendar-bounded (day) agg with map-side combine.
    "attribution_lasttouch" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        Tables.load(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("cus", when(col("event_type") === "click", col("us")))
          .withColumn("last_click_us", last(col("cus"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(col("last_click_us").isNotNull
              && col("us") - col("last_click_us") <= 604800000000L, 1L).otherwise(0L))
              .as("n_attributed"))
          .orderBy("d")
      },
      oracle = Some(
        """WITH t AS (SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
          |             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS cus
          |           FROM events),
          |w AS (SELECT *, LAST_VALUE(cus IGNORE NULLS) OVER (
          |               PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
          |      FROM t)
          |SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_purchases,
          |       CAST(SUM(CASE WHEN last_click_us IS NOT NULL
          |                      AND us - last_click_us <= 604800000000 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_attributed
          |FROM w WHERE event_type = 'purchase'
          |GROUP BY CAST(ts AS DATE) ORDER BY d""".stripMargin)),

    // ---- U-shaped position-based attribution (added r8) ------------------
    // The third industry-standard attribution model, closing the triad:
    // lasttouch (naive), Markov removal (data-driven), and POSITION-BASED
    // — 40% first touch, 40% last touch, 20% split across middles, 12-touch
    // lookback. EXACT-INTEGER credits: every credit is a multiple of
    // 1/12600 conversion units — 12600 = 5·LCM(1..10), so 40% = 5040,
    // 50% = 6300, 100% = 12600, and the middle share 2520/(k−2) is an
    // INTEGER for every capped journey length k ≤ 12 (that is WHY the cap
    // and the unit were chosen together). Per-journey credits sum to
    // exactly 12600, so channel shares are conserved by construction and
    // the emitted share is ONE bare division of exact int64 sums.
    //
    // Journeys reuse the attribution_markov definition: per user in
    // (ts, event_id) order, a purchase closes the journey; only converted
    // journeys credit; the last 12 non-purchase touches before the
    // conversion participate.
    //
    // Scale shape: ONE user_id exchange feeds the journey-id cumsum, the
    // converted flag, and both position windows; the credit roll-up is a
    // ≤|types| agg + 1-row total broadcast.
    "attribution_position" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = Tables.load(s, dir, "events")
          .withColumn("isp", when(col("event_type") === "purchase", 1L).otherwise(0L))
          .withColumn("jid",
            sum(col("isp")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .na.fill(0L, Seq("jid"))
        val wj = Window.partitionBy("user_id", "jid")
        val wjDesc = Window.partitionBy("user_id", "jid")
          .orderBy(col("ts").desc, col("event_id").desc)
        val touches = ev
          .withColumn("conv", max(col("isp")).over(wj))
          .filter(col("conv") === 1 && col("isp") === 0)
          .withColumn("rnd", row_number().over(wjDesc))
          .filter(col("rnd") <= 12)
        val wk = Window.partitionBy("user_id", "jid")
        val credited = touches
          .withColumn("k", count(lit(1)).over(wk))
          .withColumn("pos", col("k") - col("rnd") + 1)
          .withColumn("credit",
            when(col("k") === 1, lit(12600L))
              .when(col("k") === 2, lit(6300L))
              .when(col("pos") === 1 || col("pos") === col("k"), lit(5040L))
              .otherwise(expr("2520 div (k - 2)")).cast("long"))
        val agg = credited.groupBy("event_type")
          .agg(sum(col("credit")).as("units"), count(lit(1)).as("n_touches"))
        val tot = agg.agg(sum(col("units")).as("tu"))
        agg.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n_touches"), col("units"),
            (col("units").cast("double") / col("tu").cast("double")).as("share"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH e AS (SELECT user_id, ts, event_id, event_type,
          |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
          |           FROM events),
          |j AS (SELECT *, COALESCE(SUM(isp) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
          |      FROM e),
          |c AS (SELECT *, MAX(isp) OVER (PARTITION BY user_id, jid) AS conv FROM j),
          |t AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, jid
          |                 ORDER BY ts DESC, event_id DESC) AS rnd
          |      FROM c WHERE conv = 1 AND isp = 0),
          |cap AS (SELECT * FROM t WHERE rnd <= 12),
          |k AS (SELECT *, COUNT(*) OVER (PARTITION BY user_id, jid) AS k FROM cap),
          |cr AS (SELECT event_type,
          |              CASE WHEN k = 1 THEN 12600
          |                   WHEN k = 2 THEN 6300
          |                   WHEN (k - rnd + 1) = 1 OR (k - rnd + 1) = k THEN 5040
          |                   ELSE 2520 // (k - 2) END AS credit
          |       FROM k),
          |a AS (SELECT event_type, CAST(SUM(credit) AS BIGINT) AS units,
          |             CAST(COUNT(*) AS BIGINT) AS n_touches
          |      FROM cr GROUP BY event_type),
          |tt AS (SELECT CAST(SUM(units) AS BIGINT) AS tu FROM a)
          |SELECT event_type, n_touches, units,
          |       CAST(units AS DOUBLE) / CAST(tu AS DOUBLE) AS share
          |FROM a, tt ORDER BY event_type""".stripMargin)),

    // ---- Markov removal-effect attribution (added r8) --------------------
    // The principled upgrade of attribution_lasttouch: instead of crediting
    // the final click, model user journeys as an absorbing Markov chain
    // (Anderl et al. 2014) and credit each channel by its REMOVAL EFFECT —
    // how much the journey-start conversion probability drops when every
    // transition into that channel is redirected to the null absorber. A
    // channel that only ever appears after the sale is already certain gets
    // near-zero credit even if it is always the last touch.
    //
    // Journeys: per user in strict (ts, event_id) order, a purchase closes
    // the current journey (edge prev → CONV) and the next event opens a new
    // one (edge START → type); a journey still open at stream end is
    // censored (edge last → NULL). Conversion probability is defined as
    // "conversion within 12 transitions" — the chain's v-iteration
    //   v⁽ᵏ⁺¹⁾(s) = Σ_t p(s, t)·v⁽ᵏ⁾(t) + p(s, CONV)
    // unrolled exactly AmIters times on BOTH engines, so the number is an
    // exact finite semantic, not a convergence approximation (the textrank
    // unrolling discipline; the geometric tail past 12 steps is what the
    // two engines would disagree on, so it is defined away).
    //
    // ENGINE-VERSION-PROOF (r8 doctrine): transition probabilities live on
    // the integer 10^-6 grid (p6 = c·10^6 div tot), each iteration is pure
    // int64 multiply/add/floor-div (5 terms ≤ 5·10^12 ≪ 2^63), removal
    // zeroes coefficients (≡ redirect-to-NULL since v(NULL) = 0, and
    // floor-monotone, so re6 ≥ 0 by induction); the emitted doubles are one
    // bare division each.
    //
    // Scale shape: ONE user_id exchange serves all four journey windows
    // (jid cumsum, lag, row_number, max share the (user_id[, jid])
    // partitioning); everything after the ≤ |states|·|states+2| edge agg is
    // constant-size — a 1-row coefficient pivot × 5 variant rows iterated
    // by 12 chained scalar projections (CollapseProject keeps the
    // multiply-referenced v's as aliases, the LnGrid discipline).
    "attribution_markov" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("jid", coalesce(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val wj = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
        val wjd = Window.partitionBy("user_id", "jid")
          .orderBy(col("ts").desc, col("event_id").desc)
        val wja = Window.partitionBy("user_id", "jid")
        val marked = ev
          .withColumn("from_s", coalesce(lag(col("event_type"), 1).over(wj), lit("START")))
          .withColumn("to_s",
            when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")))
          .withColumn("rd", row_number().over(wjd))
          .withColumn("hp",
            max(when(col("event_type") === "purchase", 1).otherwise(0)).over(wja))
        // each row emits its own edge; a censored journey's last row emits
        // the tail→NULL edge in the SAME pass (a union of two selects over
        // `marked` would run the whole window pipeline twice)
        val edges = marked.select(explode(
            when(col("rd") === 1 && col("hp") === 0,
              array(struct(col("from_s"), col("to_s")),
                struct(col("event_type").as("from_s"), lit("NULL").as("to_s"))))
              .otherwise(array(struct(col("from_s"), col("to_s"))))).as("e"))
          .select(col("e.from_s").as("from_s"), col("e.to_s").as("to_s"))
        val ec = edges.groupBy("from_s", "to_s").agg(count(lit(1)).as("c"))
        val tt = ec.groupBy("from_s").agg(sum(col("c")).as("tot"))
        val ep = ec.join(tt, Seq("from_s"))
          .withColumn("p6", expr("(c * 1000000) div tot"))
        val coefExprs = AmStates.zipWithIndex.flatMap { case (st, i) =>
          AmChannels.zipWithIndex.map { case (ch, j) =>
            coalesce(sum(when(col("from_s") === st && col("to_s") === ch, col("p6"))),
              lit(0L)).as(s"p_${i}_${j + 1}")
          } :+
            coalesce(sum(when(col("from_s") === st && col("to_s") === "CONV", col("p6"))),
              lit(0L)).as(s"pc_$i")
        }
        val coef = ep.agg(coefExprs.head, coefExprs.tail: _*)
        import s.implicits._
        val variants = ("none" +: AmChannels).toDF("removed")
        val masked = AmStates.indices.foldLeft(coef.crossJoin(variants)) { (d, i) =>
          AmChannels.zipWithIndex.foldLeft(d) { case (d2, (ch, j)) =>
            d2.withColumn(s"p_${i}_${j + 1}",
              when(col("removed") === ch, 0L).otherwise(col(s"p_${i}_${j + 1}")))
          }
        }
        // the 12-step iteration as ONE aggregate() HOF over the v-array —
        // a single projection instead of 12 chained ones (the survival_km
        // recurrence discipline; 12 unrolled Projects cost ~2 s of
        // analyzer+codegen time for zero data-side benefit)
        val stepBody = AmStates.indices.map { i =>
          val terms = AmChannels.indices.map(j => s"p_${i}_${j + 1} * acc[${j + 1}]")
            .mkString(" + ")
          s"($terms + pc_$i * 1000000) div 1000000"
        }.mkString(", ")
        val zeros = AmStates.indices.map(_ => "0L").mkString(", ")
        val it = masked.withColumn("v_arr", expr(
          s"aggregate(sequence(1, $AmIters), array($zeros), (acc, step) -> array($stepBody))"))
        // base/total distribution via global windows over the 5-row variant
        // frame (R2-whitelisted, bound = the variant dimension) — a
        // crossJoin(broadcast(agg)) here would RE-RUN the whole journey
        // pipeline per consumer (measured: 17 scans), where the window
        // keeps single consumption
        val wAll = Window.partitionBy()
        val withBase = it
          .withColumn("base6",
            max(when(col("removed") === "none", expr("v_arr[0]"))).over(wAll))
          .filter(col("removed") =!= "none")
          .withColumn("channel", col("removed"))
          .withColumn("rem6", expr("v_arr[0]"))
          .withColumn("re6", col("base6") - col("rem6"))
          .withColumn("t", sum(col("re6")).over(wAll))
        withBase
          .select(col("channel"),
            (col("base6").cast("double") / lit(1000000L).cast("double")).as("base_conv"),
            (col("rem6").cast("double") / lit(1000000L).cast("double")).as("removed_conv"),
            (col("re6").cast("double") / lit(1000000L).cast("double")).as("removal_effect"),
            when(col("t") > 0, col("re6").cast("double") / col("t").cast("double"))
              .as("share"))
          .orderBy("channel")
      },
      oracle = Some(amOracleSql)),

    // ---- Kaplan–Meier survival: time to first purchase (r7; refit r8) ----
    // Right-censored time-to-event — the correct way to answer "how long
    // until users convert" when many never do (a plain mean over converters
    // is survivorship-biased). Per user: duration = days from first event
    // to first purchase (event) or to last event (censored). The KM
    // estimator S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) is a cumulative PRODUCT.
    // ENGINE-VERSION-PROOF (r8 doctrine, Queries.scala): r7 emitted it in
    // log space via round(ln(·), 6), which matched the local DuckDB
    // bitwise yet hash-failed the driver's build. The product is now an
    // exact INTEGER recurrence on the 10^-9 grid:
    //   S₀ = 10^9;  Sᵢ = (Sᵢ₋₁ · (nᵢ − dᵢ)) div nᵢ
    // — pure int64 multiply + floor division at every step (exact while
    // S·n_risk < 2^63, i.e. risk sets to ~9e9; beyond that widen to
    // DECIMAL(38,0) on both engines), with ONE bare final IEEE division
    // by 10^9. A death row that exhausts its risk set yields Sᵢ = 0
    // naturally — no NULL sentinel needed. The Spark leg runs the
    // recurrence declaratively: the death grid (day-domain bounded,
    // PlanGuard R2 whitelist) collapses to one sorted array and each
    // row's Sᵢ is `aggregate(slice(arr, 1, i+1), …)` — O(k²) over the
    // tiny grid, zero driver-side collect. The oracle spells the same
    // recurrence as a WITH RECURSIVE chain (version-stable SQL).
    //
    // Scale shape: one per-user agg, then everything runs on the duration
    // grid — day-domain bounded, so the global cumulative window and the
    // array fold are over a tiny aggregate (PlanGuard R2 whitelist).
    "survival_km" -> Q(
      fn = (s, dir) => {
        val obs = Tables.load(s, dir, "events")
          .groupBy("user_id").agg(
            min(col("ts")).as("t0"),
            min(when(col("event_type") === "purchase", col("ts"))).as("td"),
            max(col("ts")).as("tc"))
          .select(
            datediff(to_date(coalesce(col("td"), col("tc"))), to_date(col("t0"))).as("t"),
            when(col("td").isNotNull, 1L).otherwise(0L).as("delta"))
        val grid = obs.groupBy("t")
          .agg(count(lit(1)).as("m"), sum(col("delta")).as("dsum"))
        val wDesc = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
        grid.withColumn("n_risk", sum(col("m")).over(wDesc))
          .filter(col("dsum") > 0)
          .agg(sort_array(collect_list(struct(col("t"), col("n_risk"), col("dsum"))))
            .as("arr"))
          .select(col("arr"), posexplode(col("arr")).as(Seq("i", "r")))
          .withColumn("surv9", expr(
            """aggregate(slice(arr, 1, i + 1), CAST(1000000000 AS BIGINT),
              |  (acc, y) -> (acc * (y.n_risk - y.dsum)) div y.n_risk)""".stripMargin))
          .select(col("r.t").as("t_day"), col("r.n_risk").as("n_risk"),
            col("r.dsum").as("n_events"),
            (col("surv9").cast("double") / lit(1.0e9)).as("survival"))
          .orderBy("t_day")
      },
      oracle = Some(
        """WITH RECURSIVE obs AS (
          |  SELECT CAST(CAST(COALESCE(td, tc) AS DATE) - CAST(t0 AS DATE) AS INTEGER) AS t,
          |         CASE WHEN td IS NOT NULL THEN 1 ELSE 0 END AS delta
          |  FROM (SELECT user_id, MIN(ts) AS t0,
          |               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS td,
          |               MAX(ts) AS tc
          |        FROM events GROUP BY user_id)),
          |grid AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(delta) AS BIGINT) AS dsum
          |         FROM obs GROUP BY t),
          |r AS (SELECT t, m, dsum,
          |             CAST(SUM(m) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk FROM grid),
          |d AS (SELECT t, n_risk, dsum,
          |             CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS rn
          |      FROM r WHERE dsum > 0),
          |s AS (
          |  SELECT rn, t, n_risk, dsum,
          |         (1000000000 * (n_risk - dsum)) // n_risk AS surv9
          |  FROM d WHERE rn = 1
          |  UNION ALL
          |  SELECT d.rn, d.t, d.n_risk, d.dsum,
          |         (s.surv9 * (d.n_risk - d.dsum)) // d.n_risk
          |  FROM s JOIN d ON d.rn = s.rn + 1)
          |SELECT t AS t_day, n_risk, dsum AS n_events,
          |       CAST(surv9 AS DOUBLE) / 1000000000.0 AS survival
          |FROM s ORDER BY t_day""".stripMargin)),

    // ---- robust (MAD) daily-volume anomalies (added r7) ------------------
    // The robust twin of daily_anomalies' mean+3σ rule: flag days where
    // |c − median| > 3·1.4826·MAD — median/MAD don't move when the
    // anomalies themselves inflate the reference (the classic failure of
    // moment-based flags on heavy-tailed traffic). ZERO float risk by
    // doubling tricks: med2 = m1+m2 (2× the R-2 median of daily counts,
    // integer), dev2 = |2c − med2| (2× deviation, integer), mad4 = median
    // of dev2 doubled again (4× MAD, integer); the flag cross-multiplies
    // to dev2·20000 > 44478·mad4 (1.4826 = 14826/10000) in DECIMAL(38,0),
    // and the reported median/MAD divide by 2 and 4 — exact powers of two.
    //
    // Scale shape: one (type, day) agg; both median passes are per-type
    // sorted lists over the calendar-bounded daily grid (the gap_quantiles
    // exact-quantile contract; approx_percentile is the 100 TB drop-in).
    "mad_anomalies" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val med = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sort_array(collect_list(col("c"))).as("arr"))
          .select(col("event_type"), expr(
            "element_at(arr, int((n - 1) div 2) + 1) + element_at(arr, int(n div 2) + 1)")
            .as("med2"))
        val dev = daily.join(med, Seq("event_type"))
          .withColumn("dev2", abs(col("c") * 2 - col("med2")))
        val mad = dev.groupBy("event_type")
          .agg(count(lit(1)).as("n2"), sort_array(collect_list(col("dev2"))).as("darr"))
          .select(col("event_type"), expr(
            "element_at(darr, int((n2 - 1) div 2) + 1) + element_at(darr, int(n2 div 2) + 1)")
            .as("mad4"))
        dev.join(mad, Seq("event_type"))
          .select(col("event_type"), col("d"), col("c"),
            (col("med2").cast("double") / lit(2.0d)).as("median_daily"),
            (col("mad4").cast("double") / lit(4.0d)).as("mad_daily"),
            (big(col("dev2")) * 20000 > big(col("mad4")) * 44478).as("is_anomaly"))
          .orderBy("event_type", "d")
      },
      oracle = Some(
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          |                 CAST(COUNT(*) AS BIGINT) AS c
          |               FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |med AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |               list_sort(list(c)) AS arr
          |        FROM daily GROUP BY event_type),
          |m2 AS (SELECT event_type,
          |              arr[CAST((n - 1) // 2 AS INTEGER) + 1]
          |                + arr[CAST(n // 2 AS INTEGER) + 1] AS med2
          |       FROM med),
          |dev AS (SELECT daily.event_type, daily.d, daily.c, m2.med2,
          |               abs(daily.c * 2 - m2.med2) AS dev2
          |        FROM daily JOIN m2 USING (event_type)),
          |mad AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n2,
          |               list_sort(list(dev2)) AS darr
          |        FROM dev GROUP BY event_type),
          |m4 AS (SELECT event_type,
          |              darr[CAST((n2 - 1) // 2 AS INTEGER) + 1]
          |                + darr[CAST(n2 // 2 AS INTEGER) + 1] AS mad4
          |       FROM mad)
          |SELECT dev.event_type, dev.d, dev.c,
          |       CAST(med2 AS DOUBLE) / 2 AS median_daily,
          |       CAST(mad4 AS DOUBLE) / 4 AS mad_daily,
          |       CAST(dev2 AS HUGEINT) * 20000 > CAST(mad4 AS HUGEINT) * 44478 AS is_anomaly
          |FROM dev JOIN m4 USING (event_type) ORDER BY dev.event_type, dev.d""".stripMargin)),

    // ---- gap-based event debounce accounting (added r7) ------------------
    // Telemetry hygiene: how much of each event stream is rapid-fire
    // repetition? An event is DEBOUNCED (dropped) when the same user fired
    // the same type within the trailing 5 minutes — the gap-to-previous
    // form (relative to the previous event, kept or not), which is the
    // SQL-expressible standard; chained-to-last-KEPT debounce is inherently
    // sequential and lives in the streaming tier's stateful processors.
    // Pure integer micros arithmetic, deterministic (ts, event_id) order.
    //
    // Scale shape: ONE (user, type)-keyed exchange for the lag window, then
    // a ≤ |types| roll-up with map-side combine.
    "debounce_events" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .withColumn("gap",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("gap").isNull || col("gap") > 300000000L, 1L).otherwise(0L))
              .as("n_kept"),
            sum(when(col("gap").isNull || col("gap") > 300000000L, 0L).otherwise(1L))
              .as("n_dropped"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH g AS (SELECT event_type,
          |             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
          |               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
          |           FROM events)
          |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
          |       CAST(SUM(CASE WHEN gap IS NULL OR gap > 300000000 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_kept,
          |       CAST(SUM(CASE WHEN gap IS NULL OR gap > 300000000 THEN 0 ELSE 1 END)
          |            AS BIGINT) AS n_dropped
          |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- calendar resample + LOCF gap-fill (added r6) --------------------
    // The time-series feature-engineering staple: regularize each user's
    // irregular purchase events onto the corpus's daily calendar grid and
    // carry the last observation forward across gap days (LOCF). Per
    // (user, day): purchase count and the day-end purchase value, where
    // "day-end" = the day's last purchase by event_id and gap days inherit
    // the most recent prior day's value (NULL before a user's first
    // purchase — LOCF never invents data). Scale shape: the observation agg
    // is one shuffle on (user, day); the grid is users × days — generated,
    // never shuffled (a 1-row global-bounds broadcast + a per-user
    // sequence() explode), so grid size is |users|·|days| rows of three
    // columns, not a corpus-sized product; the LOCF window partitions by
    // user over |days|-sized partitions. Value parity is trivially exact:
    // LOCF copies source doubles, no arithmetic touches them.
    "resample_locf" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val obs = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_purchases"),
            max_by(col("value"), col("event_id")).as("day_last"))
        val bounds = ev.agg(to_date(min(col("ts"))).as("d0"),
          to_date(max(col("ts"))).as("d1"))
        val grid = ev.select("user_id").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")
        grid.join(obs, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
            last(col("day_last"), ignoreNulls = true).over(w).as("locf_value"))
          .orderBy("user_id", "day")
      },
      oracle = Some(
        """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day, "value", event_id
          |           FROM events WHERE event_type = 'purchase'),
          |obs AS (SELECT user_id, day, COUNT(*) AS n_purchases,
          |               arg_max("value", event_id) AS day_last
          |        FROM p GROUP BY user_id, day),
          |b AS (SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
          |      FROM events),
          |grid AS (SELECT u.user_id,
          |                CAST(UNNEST(generate_series(CAST(b.d0 AS TIMESTAMP),
          |                                            CAST(b.d1 AS TIMESTAMP),
          |                                            INTERVAL 1 DAY)) AS DATE) AS day
          |         FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN b)
          |SELECT g.user_id, g.day,
          |       COALESCE(o.n_purchases, 0) AS n_purchases,
          |       last_value(o.day_last IGNORE NULLS) OVER (
          |         PARTITION BY g.user_id ORDER BY g.day) AS locf_value
          |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
          |ORDER BY g.user_id, g.day""".stripMargin)),

    // ---- snapshot diff: the CDC primitive (added r6) ---------------------
    // Two activity snapshots (users active in a 6-hour window, with their
    // event counts as the payload) diffed into the four change-data-capture
    // classes: added (only in the later snapshot), removed (only in the
    // earlier), changed (payload differs), unchanged. The full-outer join
    // on the entity key IS the diff — the shape behind incremental
    // lakehouse table maintenance (MERGE source classification). Scale
    // shape: both snapshot aggs shuffle once on user_id and the join reuses
    // that same partitioning (co-partitioned full outer, no broadcast
    // needed at any scale); the class roll-up is 4 rows.
    "snapshot_diff" -> Q(
      fn = (s, dir) => {
        def snap(d0: String, d1: String, n: String) =
          Tables.load(s, dir, "events")
            .filter(col("ts") >= lit(d0).cast("timestamp") &&
              col("ts") < lit(d1).cast("timestamp"))
            .groupBy("user_id").agg(count(lit(1)).as(n))
        val w1 = snap("2024-01-10 00:00:00", "2024-01-10 06:00:00", "n1")
        val w2 = snap("2024-01-24 00:00:00", "2024-01-24 06:00:00", "n2")
        w1.join(w2, Seq("user_id"), "full_outer")
          .withColumn("class",
            when(col("n1").isNull, "added")
              .when(col("n2").isNull, "removed")
              .when(col("n1") === col("n2"), "unchanged")
              .otherwise("changed"))
          .groupBy("class")
          .agg(count(lit(1)).as("n_users"),
            coalesce(sum(col("n1")), lit(0L)).as("rows_before"),
            coalesce(sum(col("n2")), lit(0L)).as("rows_after"))
          .orderBy("class")
      },
      oracle = Some(
        """WITH w1 AS (SELECT user_id, COUNT(*) AS n1 FROM events
          |            WHERE ts >= TIMESTAMP '2024-01-10'
          |              AND ts < TIMESTAMP '2024-01-10 06:00:00' GROUP BY 1),
          |w2 AS (SELECT user_id, COUNT(*) AS n2 FROM events
          |       WHERE ts >= TIMESTAMP '2024-01-24'
          |         AND ts < TIMESTAMP '2024-01-24 06:00:00' GROUP BY 1),
          |j AS (SELECT COALESCE(w1.user_id, w2.user_id) AS user_id, n1, n2
          |      FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id)
          |SELECT CASE WHEN n1 IS NULL THEN 'added' WHEN n2 IS NULL THEN 'removed'
          |            WHEN n1 = n2 THEN 'unchanged' ELSE 'changed' END AS class,
          |       COUNT(*) AS n_users,
          |       CAST(COALESCE(SUM(n1), 0) AS BIGINT) AS rows_before,
          |       CAST(COALESCE(SUM(n2), 0) AS BIGINT) AS rows_after
          |FROM j GROUP BY 1 ORDER BY class""".stripMargin)),

    // ---- SCD-2 interval build (added r6) ---------------------------------
    // Slowly-changing-dimension type 2 off the event stream: per user,
    // compress the purchase-value history to its CHANGE POINTS (keep a row
    // only where the value differs from the previous observation) and emit
    // validity intervals [valid_from, valid_to) via lead(), the open
    // current row carrying valid_to = NULL. Two windows over the same
    // (user_id)-partitioned (ts, event_id) order — one exchange + one sort
    // feed both (the filter between them preserves order and partitioning).
    // Values pass through untouched, so parity needs no float discipline.
    "scd2_intervals" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .withColumn("pv", lag(col("value"), 1).over(w))
          .filter(col("pv").isNull || col("value") =!= col("pv"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("ts").as("valid_from"), col("valid_to"),
            col("value"), col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "valid_from")
      },
      oracle = Some(
        """WITH p AS (SELECT user_id, ts, event_id, "value",
          |                  lag("value") OVER (PARTITION BY user_id
          |                                     ORDER BY ts, event_id) AS pv
          |           FROM events WHERE event_type = 'purchase'),
          |ch AS (SELECT user_id, ts, event_id, "value"
          |       FROM p WHERE pv IS NULL OR "value" != pv)
          |SELECT user_id, ts AS valid_from,
          |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
          |       "value",
          |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |         AS is_current
          |FROM ch ORDER BY user_id, valid_from""".stripMargin)),

    // ---- per-bucket per-window admission quota (added r6) ----------------
    // The throttling half of bucket priority (the reference's buckets
    // prioritize; quotas BOUND): admit the first N=50 events per
    // (event_type, day) in strict (ts, event_id) order, report
    // admitted/dropped per window. Row-level semantics are a row_number
    // over the (bucket, day) partition — bounded per key by one day's
    // traffic, never a global sort; the accounting agg reuses the window's
    // partitioning. Streaming twin: PriorityStreams.quotaStream (spec-pinned
    // equal on the same events).
    "quota_admit" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type", "day").orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("rn", row_number().over(w))
          .groupBy("event_type", "day")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("rn") <= 50, 1).otherwise(0)).as("n_admitted"),
            sum(when(col("rn") > 50, 1).otherwise(0)).as("n_dropped"))
          .orderBy("event_type", "day")
      },
      oracle = Some(
        """WITH r AS (SELECT event_type, CAST(ts AS DATE) AS day,
          |                  ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
          |                                     ORDER BY ts, event_id) AS rn
          |           FROM events)
          |SELECT event_type, day, COUNT(*) AS n_events,
          |       CAST(SUM(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
          |       CAST(SUM(CASE WHEN rn > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
          |FROM r GROUP BY event_type, day ORDER BY event_type, day""".stripMargin)),

    // ---- ordered 3-step funnel ------------------------------------------
    // click → signup → purchase with strict ordering: each step's frame is
    // one per-user min-ts agg (≤ |users| rows) joined onto the next step's
    // filtered event scan. Scale shape: the event side is scanned once per
    // step with the step's type filter PUSHED to parquet; the per-user
    // frames carry NO broadcast hint — size-based selection broadcasts
    // them while they fit and falls back to a user_id-keyed shuffle join
    // beyond that (a forced hint would OOM the driver at a 100M-user
    // corpus); each agg is partial+final on user_id.
    "funnel_steps" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val c = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val sg = ev.filter(col("event_type") === "signup")
          .join(c, Seq("user_id")).filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(sg, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        c.agg(count(lit(1)).as("n_users")).select(lit("1_click").as("step"), col("n_users"))
          .unionByName(
            sg.agg(count(lit(1)).as("n_users")).select(lit("2_signup").as("step"), col("n_users")))
          .unionByName(
            p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase").as("step"), col("n_users")))
          .orderBy("step")
      },
      oracle = Some(
        """WITH c AS (SELECT user_id, MIN(ts) AS t1 FROM events
          |           WHERE event_type = 'click' GROUP BY user_id),
          |s AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          |      JOIN c ON e.user_id = c.user_id
          |      WHERE e.event_type = 'signup' AND e.ts > c.t1 GROUP BY e.user_id),
          |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          |      JOIN s ON e.user_id = s.user_id
          |      WHERE e.event_type = 'purchase' AND e.ts > s.t2 GROUP BY e.user_id)
          |SELECT '1_click' AS step, COUNT(*) AS n_users FROM c
          |UNION ALL SELECT '2_signup', COUNT(*) FROM s
          |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
          |ORDER BY step""".stripMargin)),

    // ---- funnel conversion latency quantiles (added r7) ------------------
    // How LONG each funnel transition takes, not just how many make it:
    // per step pair (click→signup, signup→purchase), exact R-7 p50/p90 of
    // the first-conversion latency in microseconds — the number an SLA or
    // a "users who don't purchase within a day are lost" analysis reads.
    // Timestamps follow funnel_steps' strict-order first-occurrence
    // semantics EXACTLY (same min-ts-after-previous-step construction),
    // so the two operators provably count the same converting users.
    // Latencies are whole micros (exactly representable doubles); the
    // lerp is gap_quantiles' spelled-out chain.
    //
    // Scale shape: the step aggs shuffle once on user_id each (funnel's
    // own plan); the per-pair sorted latency list is the exact-quantile
    // contract — approx_percentile is the documented 100 TB drop-in
    // (gap_quantiles' note applies verbatim).
    "conversion_latency" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val c = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val sg = ev.filter(col("event_type") === "signup")
          .join(c, Seq("user_id")).filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(sg, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        // `get()` (NULL on out-of-range) instead of `gaps[...]` (ANSI error):
        // these are GLOBAL aggs, so an empty corpus still emits one row with
        // gaps = [] and index -1 — get() turns both quantiles NULL there,
        // exactly what DuckDB's out-of-bounds list index yields. Non-empty
        // inputs index in range, where the two forms are identical.
        def q(pp: Double, name: String) = Q.grid6(expr(
          s"""get(gaps, int(floor($pp * (size(gaps) - 1))))
             |+ ($pp * (size(gaps) - 1) - floor($pp * (size(gaps) - 1)))
             |  * (get(gaps, int(ceil($pp * (size(gaps) - 1))))
             |     - get(gaps, int(floor($pp * (size(gaps) - 1)))))""".stripMargin))
          .as(name)
        def leg(gapsDf: org.apache.spark.sql.DataFrame, label: String) =
          gapsDf.agg(count(lit(1)).as("n_users"),
              sort_array(collect_list(col("gap"))).as("gaps"))
            .select(lit(label).as("step"), col("n_users"),
              q(0.5, "p50_us"), q(0.9, "p90_us"))
        val l12 = sg.join(c, Seq("user_id"))
          .select((unix_micros(col("t2")) - unix_micros(col("t1"))).cast("double").as("gap"))
        val l23 = p.join(sg, Seq("user_id"))
          .select((unix_micros(col("t3")) - unix_micros(col("t2"))).cast("double").as("gap"))
        leg(l12, "1_click_to_signup").unionByName(leg(l23, "2_signup_to_purchase"))
          .orderBy("step")
      },
      oracle = Some {
        def q(pp: Double, name: String) =
          s"""floor((gaps[CAST(floor($pp * (len(gaps) - 1)) AS INTEGER) + 1]
             |+ ($pp * (len(gaps) - 1) - floor($pp * (len(gaps) - 1)))
             |  * (gaps[CAST(ceil($pp * (len(gaps) - 1)) AS INTEGER) + 1]
             |     - gaps[CAST(floor($pp * (len(gaps) - 1)) AS INTEGER) + 1]))
             |  * 1000000.0) / 1000000.0 AS $name"""
            .stripMargin
        s"""WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |c AS (SELECT user_id, MIN(ts) AS t1 FROM ev
           |      WHERE event_type = 'click' GROUP BY user_id),
           |s AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
           |      JOIN c ON e.user_id = c.user_id
           |      WHERE e.event_type = 'signup' AND e.ts > c.t1 GROUP BY e.user_id),
           |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e
           |      JOIN s ON e.user_id = s.user_id
           |      WHERE e.event_type = 'purchase' AND e.ts > s.t2 GROUP BY e.user_id),
           |g12 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           |               list_sort(list(CAST(epoch_us(s.t2) - epoch_us(c.t1) AS DOUBLE))) AS gaps
           |        FROM s JOIN c ON s.user_id = c.user_id),
           |g23 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           |               list_sort(list(CAST(epoch_us(p.t3) - epoch_us(s.t2) AS DOUBLE))) AS gaps
           |        FROM p JOIN s ON p.user_id = s.user_id)
           |SELECT * FROM (
           |  SELECT '1_click_to_signup' AS step, n_users, ${q(0.5, "p50_us")}, ${q(0.9, "p90_us")} FROM g12
           |  UNION ALL
           |  SELECT '2_signup_to_purchase', n_users, ${q(0.5, "p50_us")}, ${q(0.9, "p90_us")} FROM g23)
           |ORDER BY step""".stripMargin
      }),

    // ---- per-event trailing feature window (added r5) --------------------
    // Online feature engineering's bread-and-butter: each event sees the
    // aggregate of its user's previous ≤3 event values (count + exact
    // decimal sum; the first event's window is empty ⇒ NULL sum on both
    // engines). Deterministic frame order is (ts, event_id). Scale shape:
    // one hash partition by user, per-user sort — the standard sessionized
    // feature-backfill plan; the STREAMING twin (featureWindowStream,
    // ListState on transformWithState) is spec-pinned equal on the same
    // in-order input.
    "feature_window" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-3, -1)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            count(col("value")).over(w).as("n_ctx"),
            sum(col("value").cast("decimal(10,2)")).over(w)
              .cast("double").as("ctx_sum"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some(
        """SELECT user_id, event_id,
          |       COUNT(value) OVER w AS n_ctx,
          |       CAST(SUM(CAST(value AS DECIMAL(10,2))) OVER w AS DOUBLE) AS ctx_sum
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          |             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
          |ORDER BY user_id, event_id""".stripMargin)),

    // ---- cohort retention (day-1 / day-7, user-relative windows) ---------
    // Cohort = calendar day of the user's first event; retained day-k =
    // any activity in [t0+k, t0+k+1). Scale shape: ONE per-user min-ts agg
    // joined back onto the stream (unhinted — broadcast while it fits, else
    // a user_id-keyed shuffle join), per-user flag agg (partial+final on
    // user_id), then a tiny per-cohort roll-up.
    "retention_cohorts" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val t0 = ev.groupBy("user_id").agg(min("ts").as("t0"))
        def win(k: Int) =
          col("ts") >= col("t0") + expr(s"INTERVAL $k DAY") &&
            col("ts") < col("t0") + expr(s"INTERVAL ${k + 1} DAY")
        val perUser = ev.join(t0, Seq("user_id"))
          .groupBy(col("user_id"), col("t0").cast("date").as("cohort"))
          .agg(
            max(when(win(1), 1).otherwise(0)).as("d1"),
            max(when(win(7), 1).otherwise(0)).as("d7"))
        perUser.groupBy("cohort")
          .agg(count(lit(1)).as("n_users"),
            sum(col("d1")).as("n_d1"), sum(col("d7")).as("n_d7"))
          .orderBy("cohort")
      },
      oracle = Some(
        """WITH t0 AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
          |f AS (SELECT e.user_id, CAST(t.t0 AS DATE) AS cohort,
          |        MAX(CASE WHEN e.ts >= t.t0 + INTERVAL 1 DAY
          |                  AND e.ts <  t.t0 + INTERVAL 2 DAY THEN 1 ELSE 0 END) AS d1,
          |        MAX(CASE WHEN e.ts >= t.t0 + INTERVAL 7 DAY
          |                  AND e.ts <  t.t0 + INTERVAL 8 DAY THEN 1 ELSE 0 END) AS d7
          |      FROM events e JOIN t0 t ON e.user_id = t.user_id
          |      GROUP BY e.user_id, CAST(t.t0 AS DATE))
          |SELECT cohort, COUNT(*) AS n_users,
          |       CAST(SUM(d1) AS BIGINT) AS n_d1, CAST(SUM(d7) AS BIGINT) AS n_d7
          |FROM f GROUP BY cohort ORDER BY cohort""".stripMargin)),

    // ---- retention half-life: exponential-decay fit (added r8) -----------
    // retention_cohorts reports two samples (d1/d7); this fits the WHOLE
    // curve: r_k = share of users active on day k relative to their own
    // first event, k ∈ 1..14, modeled as r_k ≈ e^(a + b·k) — the standard
    // retention decay model — via least squares on ln r_k, reported as the
    // decay slope (nats/day) and half_life = ln 2 / −b, the "how many days
    // until half the remaining users stop showing up" number a retention
    // review leads with.
    //
    // ENGINE-VERSION-PROOF (r8 doctrine): day indexes are exact integer
    // micros arithmetic; r_k's ln comes from [[LnGrid]] over exact counts
    // (ln6(n_k, n_users) ≤ 0); the regression runs on exact int64
    // sufficient statistics (n, Σk, Σk², Σy6, Σk·y6 — the zipf_fit
    // micro-unit discipline), and each emitted double is ONE bare
    // division: slope = num/(den·10^6), half_life = 693147·den/(−num)
    // (the ln 2 grid constant — exact int64 products on both sides).
    // Days with zero active users are excluded from the fit on both
    // engines; a non-decaying curve (num ≥ 0) or a degenerate fit
    // (n_days < 2) reports NULLs rather than a nonsense half-life.
    //
    // Scale shape: one events pass + the per-user t0 agg joined back (the
    // retention_cohorts shape); everything after the ≤14-row day grid is
    // constant — the 1-row user total broadcast is R1-whitelisted.
    "retention_halflife" -> Q(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val t0 = ev.groupBy("user_id").agg(min("ts").as("t0"))
        val nu = t0.agg(count(lit(1)).as("n_users"))
        val act = ev.join(t0, Seq("user_id"))
          .select(col("user_id"),
            expr("(unix_micros(ts) - unix_micros(t0)) div 86400000000").as("k"))
          .filter(col("k") >= 1 && col("k") <= 14)
          .distinct()
        val grid = act.groupBy("k").agg(count(lit(1)).as("n_k"))
          .crossJoin(broadcast(nu))
        val y = LnGrid.withLn6(grid, col("n_k"), col("n_users"), "y6")
        y.agg(count(lit(1)).as("n_days"),
            sum(col("k")).as("sx"), sum(col("k") * col("k")).as("sxx"),
            sum(col("y6")).as("sy6"), sum(col("k") * col("y6")).as("sxy6"),
            max(col("n_users")).as("n_users"))
          .select(col("n_users"), col("n_days"),
            (col("n_days") * col("sxy6") - col("sx") * col("sy6")).as("num"),
            (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"))
          .select(coalesce(col("n_users"), lit(0L)).as("n_users"), col("n_days"),
            when(col("n_days") >= 2 && col("den") > 0,
              col("num").cast("double") / (col("den") * lit(1000000L)).cast("double"))
              .as("slope"),
            when(col("n_days") >= 2 && col("den") > 0 && col("num") < 0,
              (lit(693147L) * col("den")).cast("double")
                / (-col("num")).cast("double")).as("half_life_days"))
      },
      oracle = Some(
        s"""WITH t0 AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id),
           |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM t0),
           |act AS (SELECT DISTINCT e.user_id,
           |          (epoch_us(e.ts) - epoch_us(t.t0)) // 86400000000 AS k
           |        FROM events e JOIN t0 t ON e.user_id = t.user_id),
           |grid AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k, n_users
           |         FROM act CROSS JOIN nu
           |         WHERE k >= 1 AND k <= 14 GROUP BY k, n_users),
           |${LnGrid.sqlCtes("grid", "n_k", "n_users", "y6", "rh_")},
           |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           |             CAST(SUM(k) AS BIGINT) AS sx,
           |             CAST(SUM(k * k) AS BIGINT) AS sxx,
           |             CAST(SUM(y6) AS BIGINT) AS sy6,
           |             CAST(SUM(k * y6) AS BIGINT) AS sxy6,
           |             MAX(n_users) AS n_users
           |      FROM rh_out),
           |b AS (SELECT n_users, n_days,
           |             n_days * sxy6 - sx * sy6 AS num,
           |             n_days * sxx - sx * sx AS den
           |      FROM a)
           |SELECT COALESCE(n_users, 0) AS n_users, n_days,
           |       CASE WHEN n_days >= 2 AND den > 0
           |            THEN CAST(num AS DOUBLE) / CAST(den * 1000000 AS DOUBLE) END AS slope,
           |       CASE WHEN n_days >= 2 AND den > 0 AND num < 0
           |            THEN CAST(693147 * den AS DOUBLE) / CAST(-num AS DOUBLE) END
           |         AS half_life_days
           |FROM b""".stripMargin)),

    // ---- event-type distribution drift per time bucket (added r7) --------
    // The monitoring verb over the reference's event domain: per 6-hour
    // bucket, KL divergence of the bucket's event-type distribution against
    // the whole-corpus distribution — the "did the traffic mix shift this
    // window" number that pages an on-call or re-triggers mix_weights
    // downstream. A bucket's support is a subset of the global support by
    // construction, so every term is finite (no smoothing needed). The
    // streaming twin is the same aggregation under a watermarked
    // window(ts, "6 hours") — the batch oracle pins the arithmetic.
    //
    // Scale shape: one events pass aggregated by (bucket, type) — partial
    // agg collapses to ≤ buckets×types rows before the shuffle; the global
    // type distribution derives from THAT agg (never a second pass); the
    // grand total is a 1-row broadcast. Same shape as source_kl.
    //
    // ENGINE-VERSION-PROOF (r8): both ln terms come from the [[LnGrid]]
    // fixed-point chain — pure int64 arithmetic on the 10⁻⁶ ln grid, so no
    // libm result or round(double, n) reaches a hashed byte; grid values
    // subtract exactly as ints, × exact count, int sum, one bare final
    // division. [[graft.streaming.PriorityStreams.driftStream]] consumes
    // the SAME grid via [[typeDriftRefMix]], so batch and stream cannot
    // diverge when the grid changes.
    "type_drift" -> Q(
      fn = (s, dir) => {
        val wt = Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "6 hours").getField("start").as("w_start"),
            col("event_type"))
          .agg(count(lit(1)).as("c_wt"))
        val wTot = wt.groupBy("w_start").agg(sum(col("c_wt")).as("n_w"))
        val gt = wt.groupBy("event_type").agg(sum(col("c_wt")).as("c_t"))
        val tot = gt.agg(sum(col("c_t")).as("n"))
        val j0 = wt.join(broadcast(wTot), Seq("w_start"))
          .join(broadcast(gt), Seq("event_type"))
          .crossJoin(broadcast(tot))
        val j1 = LnGrid.withLn6(j0, col("c_wt"), col("n_w"), "lw6", "__lw_")
        val j2 = LnGrid.withLn6(j1, col("c_t"), col("n"), "lg6", "__lg_")
        j2.select(col("w_start"), col("n_w"),
            (col("c_wt") * (col("lw6") - col("lg6"))).as("k6"))
          .groupBy("w_start", "n_w")
          .agg(sum(col("k6")).as("sk"))
          .select(col("w_start"), col("n_w").as("n_events"),
            (col("sk").cast("double")
              / (col("n_w") * lit(1000000L)).cast("double")).as("drift_nats"))
          .orderBy("w_start")
      },
      oracle = Some(
        s"""WITH wt AS (
           |  SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS w_start,
           |         event_type, COUNT(*) AS c_wt
           |  FROM events GROUP BY 1, 2),
           |wtot AS (SELECT w_start, CAST(SUM(c_wt) AS BIGINT) AS n_w FROM wt GROUP BY w_start),
           |gt AS (SELECT event_type, CAST(SUM(c_wt) AS BIGINT) AS c_t FROM wt GROUP BY event_type),
           |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM gt),
           |j AS (SELECT wt.w_start, wt.event_type, CAST(c_wt AS BIGINT) AS c_wt, n_w, c_t, n
           |      FROM wt JOIN wtot USING (w_start) JOIN gt USING (event_type), tot),
           |${LnGrid.sqlCtes("j", "c_wt", "n_w", "lw6", "lw_")},
           |${LnGrid.sqlCtes("lw_out", "c_t", "n", "lg6", "lg_")}
           |SELECT w_start, n_w AS n_events,
           |       CAST(SUM(c_wt * (lw6 - lg6)) AS DOUBLE)
           |         / CAST(n_w * 1000000 AS DOUBLE) AS drift_nats
           |FROM lg_out GROUP BY w_start, n_w ORDER BY w_start""".stripMargin)),

    // ---- event-type Markov transition matrix (added r7) ------------------
    // The sequence-modeling complement of funnel_steps: the first-order
    // Markov model P(next_type | cur_type) over each user's event stream in
    // strict (ts, event_id) order. This is the training target of
    // next-event-prediction models and the sanity check behind funnel
    // design (a funnel step pair with near-zero transition mass is dead).
    // Semantics: transitions never cross users; the last event of a user
    // has no successor and contributes nothing.
    //
    // Scale shape: ONE shuffle on user_id for the lead() window (per-user
    // partitions — millions of small partitions, no skew), then the
    // (cur, nxt) agg collapses to ≤ |types|² rows with map-side combine;
    // the row-total join is over the same ≤ |types|² frame (broadcast).
    // Float parity: counts are exact ints; prob is ONE bare
    // correctly-rounded division per row — no round, per Queries.scala
    // discipline.
    "transition_matrix" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val seq = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type").as("cur"),
            lead(col("event_type"), 1).over(w).as("nxt"))
          .filter(col("nxt").isNotNull)
        val p = seq.groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        val tot = p.groupBy("cur").agg(sum(col("c")).as("tot"))
        p.join(broadcast(tot), Seq("cur"))
          .select(col("cur"), col("nxt"), col("c"),
            (col("c").cast("double") / col("tot")).as("prob"))
          .orderBy("cur", "nxt")
      },
      oracle = Some(
        """WITH seq AS (
          |  SELECT user_id, event_type AS cur,
          |         LEAD(event_type) OVER (PARTITION BY user_id
          |                                ORDER BY ts, event_id) AS nxt
          |  FROM events),
          |p AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
          |      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
          |t AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS tot FROM p GROUP BY cur)
          |SELECT p.cur, p.nxt, c, CAST(c AS DOUBLE) / tot AS prob
          |FROM p JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin)),

    // ---- per-state transition entropy (added r8) --------------------------
    // The one-number summary of each transition_matrix ROW:
    // H(next | cur = s) = −Σ_b p(b|s)·ln p(b|s) in nats — how PREDICTABLE
    // a user's next step is from state s (0 = deterministic funnel edge,
    // ln|types| = uniform chaos). The per-state profile tells a funnel
    // designer which steps are decision points vs conveyor belts, and its
    // count-weighted mean is the Markov chain's conditional entropy — the
    // compressibility floor of the event stream and the sanity bound for
    // event_seq_logprob's scores (a user score far below −H is surprising
    // by construction). ENGINE-VERSION-PROOF: the algebra folds to
    // H = (Σ_b c·ln6(tot, c)) / (tot·10^6) — each ln is [[LnGrid]] over
    // exact transition counts (ln(tot/c) = −ln p keeps every value
    // positive), weighted by exact ints, ONE bare final division.
    //
    // Scale shape: transition_matrix's own — one user_id window exchange,
    // a ≤|types|² agg, a ≤|types| roll-up. Constant past the first agg.
    "transition_entropy" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val seq = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type").as("cur"),
            lead(col("event_type"), 1).over(w).as("nxt"))
          .filter(col("nxt").isNotNull)
        val p = seq.groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        val tot = p.groupBy("cur").agg(sum(col("c")).as("tot"))
        LnGrid.withLn6(p.join(broadcast(tot), Seq("cur")),
            col("tot"), col("c"), "lnic6")
          .groupBy("cur", "tot")
          .agg(count(lit(1)).as("n_next"), sum(col("c") * col("lnic6")).as("sh"))
          .select(col("cur"), col("tot").as("n_trans"), col("n_next"),
            (col("sh").cast("double")
              / (col("tot") * lit(1000000L)).cast("double")).as("entropy_nats"))
          .orderBy("cur")
      },
      oracle = Some(
        s"""WITH seq AS (
           |  SELECT user_id, event_type AS cur,
           |         LEAD(event_type) OVER (PARTITION BY user_id
           |                                ORDER BY ts, event_id) AS nxt
           |  FROM events),
           |p AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
           |      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
           |t AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS tot FROM p GROUP BY cur),
           |pj AS (SELECT p.cur, p.nxt, p.c, t.tot FROM p JOIN t USING (cur)),
           |${LnGrid.sqlCtes("pj", "tot", "c", "lnic6", "te_")},
           |a AS (SELECT cur, tot, CAST(COUNT(*) AS BIGINT) AS n_next,
           |             CAST(SUM(c * lnic6) AS BIGINT) AS sh
           |      FROM te_out GROUP BY cur, tot)
           |SELECT cur, tot AS n_trans, n_next,
           |       CAST(sh AS DOUBLE) / CAST(tot * 1000000 AS DOUBLE) AS entropy_nats
           |FROM a ORDER BY cur""".stripMargin)),

    // ---- per-user sequence likelihood under the Markov model (added r7) --
    // transition_matrix turned into a SCORER: each user's event stream gets
    // its average transition log-likelihood under the corpus-wide
    // first-order model — the behavioral-anomaly number (a user whose
    // sequence the crowd model finds surprising is a bot, an integration
    // bug, or a genuinely novel journey; the event-stream twin of
    // unigram_logprob's corpus-relative doc score). Self-scoring like
    // unigram_logprob: the model is fit on the full corpus including the
    // scored user (heldout_bigram_ppl demonstrates the split discipline
    // where generalization-honesty matters). Users with < 2 events have no
    // transitions and drop out.
    //
    // ENGINE-VERSION-PROOF (r8): each transition ln comes from
    // [[LnGrid]]'s fixed-point integer chain (via the shared
    // [[transitionModelLn6]] builder — the streaming seqScoreStream twin
    // consumes the SAME frame, so batch and stream cannot band
    // differently); weights by the exact transition count, sums as exact
    // int64, and the final average is one bare division by n·10^6.
    // Scale shape: ONE user_id shuffle for the lead() window; the model is
    // a ≤ |types|² broadcast; the per-user agg reuses the window's user_id
    // partitioning. Every per-transition row carries 2 small ints.
    "event_seq_logprob" -> Q(
      fn = (s, dir) => {
        val ut = userTransitionCounts(Tables.load(s, dir, "events"))
        val lp = transitionModelLn6(ut)
        ut.join(broadcast(lp), Seq("cur", "nxt"))
          .groupBy("user_id")
          .agg(sum(col("c")).as("n_trans"), sum(col("lp6") * col("c")).as("sl"))
          .select(col("user_id"), col("n_trans"),
            (col("sl").cast("double")
              / (col("n_trans") * lit(1000000L)).cast("double")).as("logprob"))
          .orderBy("user_id")
      },
      oracle = Some(
        s"""WITH seq AS (
           |  SELECT user_id, event_type AS cur,
           |         LEAD(event_type) OVER (PARTITION BY user_id
           |                                ORDER BY ts, event_id) AS nxt
           |  FROM events),
           |ut AS (SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM seq WHERE nxt IS NOT NULL GROUP BY user_id, cur, nxt),
           |p AS (SELECT cur, nxt, CAST(SUM(c) AS BIGINT) AS cpc FROM ut GROUP BY cur, nxt),
           |t AS (SELECT cur, CAST(SUM(cpc) AS BIGINT) AS cp FROM p GROUP BY cur),
           |pj AS (SELECT p.cur, p.nxt, cpc, cp FROM p JOIN t USING (cur)),
           |${LnGrid.sqlCtes("pj", "cpc", "cp", "lp6", "es_")},
           |a AS (SELECT user_id, SUM(c) AS n_trans, SUM(lp6 * c) AS sl
           |      FROM ut JOIN es_out USING (cur, nxt) GROUP BY user_id)
           |SELECT user_id, CAST(n_trans AS BIGINT) AS n_trans,
           |       CAST(sl AS DOUBLE) / CAST(n_trans * 1000000 AS DOUBLE) AS logprob
           |FROM a ORDER BY user_id""".stripMargin)),

    // ---- per-user activity profile (added r7) ----------------------------
    // The feature-engineering roll-up feeding churn/engagement models: per
    // user, total events, distinct active days, the busiest day, the mean
    // events-per-active-day, and burstiness = max_day / mean_day — the
    // "everything in one session" vs "steady usage" discriminator
    // (burstiness 1.0 = perfectly even).
    //
    // Scale shape: daily agg shuffles once on (user_id, day) with map-side
    // combine, the per-user roll-up reuses the user_id-prefixed
    // partitioning (no second full shuffle under AQE), output is
    // |users|-sized. Float parity: mean_day is one bare division of exact
    // ints; burstiness = max_day·active_days / n_events keeps the
    // numerator an exact int product so the whole value is again ONE
    // correctly-rounded division (never double/double).
    "user_activity_profile" -> Q(
      fn = (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("cd"))
          .groupBy("user_id")
          .agg(sum(col("cd")).as("n_events"),
            count(lit(1)).as("active_days"),
            max(col("cd")).as("max_day"))
          .select(col("user_id"), col("n_events"), col("active_days"),
            col("max_day"),
            (col("n_events").cast("double") / col("active_days")).as("mean_day"),
            ((col("max_day") * col("active_days")).cast("double") / col("n_events"))
              .as("burstiness"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS cd
          |  FROM events GROUP BY user_id, CAST(ts AS DATE))
          |SELECT user_id,
          |       CAST(SUM(cd) AS BIGINT) AS n_events,
          |       CAST(COUNT(*) AS BIGINT) AS active_days,
          |       CAST(MAX(cd) AS BIGINT) AS max_day,
          |       CAST(SUM(cd) AS DOUBLE) / COUNT(*) AS mean_day,
          |       CAST(MAX(cd) * COUNT(*) AS DOUBLE) / SUM(cd) AS burstiness
          |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- top session paths (added r7) ------------------------------------
    // Clickstream path mining: sessionize each user's stream with the SAME
    // 30-minute gap rule as q_session_window (a gap of exactly 30 min
    // starts a new session — Spark merges half-open [t, t+gap) intervals),
    // take each session's first ≤3 event types in strict (ts, event_id)
    // order as the session's entry path, and count sessions per path —
    // the "how do journeys start" table behind landing-flow design.
    //
    // Scale shape: ONE user_id shuffle serves both windows (gaps-and-
    // islands break flags, then the running session id); the per-session
    // agg reuses the (user_id)-prefixed partitioning; the final path agg
    // collapses to ≤ |types|³ rows with map-side combine. The per-session
    // collect_list is bounded by session length (a user's 30-min burst),
    // not the corpus. Float surface: none — pure counts.
    "session_paths" -> Q(
      fn = (s, dir) => {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = wOrd.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val sess = Tables.load(s, dir, "events")
          .withColumn("brk",
            when(lag(col("ts"), 1).over(wOrd).isNull
              || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd))
                   >= 1800L * 1000000L, 1).otherwise(0))
          .withColumn("sid", sum(col("brk")).over(wRun))
        sess.groupBy("user_id", "sid")
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(concat_ws(">",
            slice(transform(col("evs"), e => e.getField("event_type")), 1, 3)).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
      },
      oracle = Some(
        """WITH t AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          |           FROM events),
          |o AS (SELECT user_id, event_id, event_type, ts,
          |        CASE WHEN LAG(ts) OVER w IS NULL
          |               OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
          |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sess AS (SELECT user_id, event_id, event_type, ts,
          |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                       ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM o),
          |p AS (SELECT user_id, sid,
          |             list(event_type ORDER BY ts, event_id) AS types
          |      FROM sess GROUP BY user_id, sid)
          |SELECT array_to_string(types[1:3], '>') AS path,
          |       CAST(COUNT(*) AS BIGINT) AS n_sessions
          |FROM p GROUP BY path
          |ORDER BY n_sessions DESC, path""".stripMargin)),

    // ---- daily volume anomalies, zero-float detection (added r7) ---------
    // Operational monitoring over the event stream: per event type, flag
    // days whose volume exceeds mean + 3σ across that type's active days.
    // The DETECTION is exact integer arithmetic end-to-end — the q11/
    // gopher_rules cross-multiplication discipline applied to variance:
    // c > μ + 3σ  ⟺  d > 0 ∧ d² > 9·(n·Q − S²)  where d = n·c − S,
    // S = Σc, Q = Σc² (all exact BIGINTs; d² and n·Q − S² compared as
    // DECIMAL(38,0) — no float can flip a verdict). The reported z-score
    // devolves to 2 correctly-rounded ops (sqrt of an exact cast, one
    // division), zero when the type's volume is constant.
    //
    // Scale shape: daily agg shuffles once on (type, day) with map-side
    // combine; per-type stats collapse to ≤ |types| rows and broadcast
    // back. At 100 TB the window for "days" is a calendar dimension —
    // both aggs stay tiny however large the corpus.
    // ---- exact quantiles of user lifetime revenue (added r8) -------------
    // The whale curve's raw numbers: p25/50/75/90 of per-user lifetime
    // purchase revenue — how concentrated is monetization (p90 ≫ p50 =
    // whale-driven; cohort_ltv is the time axis, this is the user-mass
    // axis). EXACT: per-user revenue as DECIMAL(18,2) → integer CENTS,
    // quantiles by nearest-rank (ceil(p·n), 1-based) over the sorted cents
    // list — pure integer indexing, no interpolation, no float until the
    // final /100 cents→currency division (dyadic-free but a single
    // correctly-rounded op on identical ints). Sorted-list contract:
    // exact at gate scale, approx_percentile is the documented 100 TB
    // drop-in (length_quantiles precedent).
    "user_ltv_quantiles" -> Q(
      fn = (s, dir) => {
        def q(p: String, name: String) =
          // get() tolerates the empty-corpus index (NULL, matching DuckDB's
          // out-of-range list access) instead of raising under ANSI
          (expr(s"get(cents, int(ceil($p * size(cents))) - 1)").cast("double") / 100.0)
            .as(name)
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
          .select((col("rev") * 100).cast("long").as("c"))
          .agg(sort_array(collect_list(col("c"))).as("cents"))
          .select(size(col("cents")).cast("long").as("n_payers"),
            q("0.25", "p25"), q("0.5", "p50"), q("0.75", "p75"), q("0.9", "p90"))
      },
      oracle = Some {
        def q(p: String, name: String) =
          s"CAST(cents[CAST(ceil($p * len(cents)) AS INTEGER)] AS DOUBLE) / 100.0 AS $name"
        s"""WITH u AS (SELECT user_id,
           |             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
           |           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
           |a AS (SELECT list_sort(list(c)) AS cents FROM u)
           |SELECT CAST(len(cents) AS BIGINT) AS n_payers,
           |       ${q("0.25", "p25")}, ${q("0.5", "p50")},
           |       ${q("0.75", "p75")}, ${q("0.9", "p90")}
           |FROM a""".stripMargin
      }),

    // ---- cohort lifetime value curves (added r8) -------------------------
    // The revenue companion of retention_cohorts: users grouped by signup
    // week (first event, Monday-truncated — identical date_trunc semantics
    // on both engines), purchase revenue accumulated per weeks-since-
    // signup, ARPU = cumulative revenue over cohort size. The curve a
    // monetization review reads ("when does a cohort pay back"), and the
    // LTV forecast's raw material. Float discipline: money sums ride
    // DECIMAL(18,2) exactly (the q1 pattern — order-independent), emitted
    // as correctly-rounded doubles; ARPU is the decimal ratio cast once.
    //
    // Scale shape: per-user first-event agg (user-keyed) + one (cohort,
    // week) revenue agg; the cumulative window PARTITIONS by cohort over
    // its ≤ calendar-span/7 week rows; cohort sizes broadcast back.
    "cohort_ltv" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.load(s, dir, "events")
        val first = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
        val sizes = first.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
        val rev = ev.filter(col("event_type") === "purchase")
          .join(first, Seq("user_id"))
          .withColumn("week_idx",
            (datediff(to_date(col("ts")), col("cohort_week")).cast("long") / 7)
              .cast("long"))
          .groupBy("cohort_week", "week_idx")
          .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
        val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_idx"))
        rev.withColumn("cum", sum(col("rev")).over(w))
          .join(broadcast(sizes), Seq("cohort_week"))
          .select(col("cohort_week"), col("week_idx"), col("n_users"),
            col("rev").cast("double").as("revenue"),
            col("cum").cast("double").as("cum_revenue"),
            // exact integer cents over users — ONE bare division (decimal
            // division itself has engine-specific scale/rounding rules)
            ((col("cum") * 100).cast("long").cast("double")
              / (col("n_users") * 100).cast("double")).as("arpu"))
          .orderBy("cohort_week", "week_idx")
      },
      oracle = Some(
        """WITH f AS (SELECT user_id,
          |                  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
          |           FROM events GROUP BY user_id),
          |sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
          |       FROM f GROUP BY cohort_week),
          |rev AS (SELECT f.cohort_week,
          |               CAST(datediff('day', f.cohort_week, CAST(e.ts AS DATE)) // 7
          |                    AS BIGINT) AS week_idx,
          |               SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
          |        FROM events e JOIN f USING (user_id)
          |        WHERE e.event_type = 'purchase'
          |        GROUP BY f.cohort_week, 2),
          |c AS (SELECT cohort_week, week_idx, rev,
          |             SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_idx) AS cum
          |      FROM rev)
          |SELECT c.cohort_week, c.week_idx, sz.n_users,
          |       CAST(c.rev AS DOUBLE) AS revenue,
          |       CAST(c.cum AS DOUBLE) AS cum_revenue,
          |       CAST(CAST(c.cum * 100 AS BIGINT) AS DOUBLE)
          |         / CAST(sz.n_users * 100 AS DOUBLE) AS arpu
          |FROM c JOIN sz USING (cohort_week)
          |ORDER BY cohort_week, week_idx""".stripMargin)),

    // ---- rolling active users: DAU / WAU / stickiness (added r8) ---------
    // The product-analytics headline triple: daily actives, trailing-7-day
    // actives, and stickiness = DAU/WAU — rolling DISTINCT, the classic
    // hard rolling aggregate (sum doesn't distribute over overlapping
    // windows; users active on several days must not double-count).
    // EXACT here via per-day user-ID sets unioned across the ROWS window
    // (all ints; stickiness ONE bare division). At 100 TB the per-day
    // set becomes an HLL sketch and the window union becomes HLL merge —
    // the same plan shape with the set column swapped (documented; the
    // registry's approx_distinct query is the sketch precedent).
    //
    // Scale shape: one (day, user) distinct agg (user IDs shuffle once) →
    // a calendar-span-bounded day frame carrying per-day ID sets; the
    // rolling union runs over ≤7 sets per row on that tiny frame.
    "rolling_active_users" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w7 = Window.orderBy(col("d")).rowsBetween(-6, 0)
        Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
          .groupBy("d")
          .agg(count(lit(1)).as("dau"), collect_set(col("user_id")).as("us"))
          .withColumn("wau7",
            size(array_distinct(flatten(collect_list(col("us")).over(w7)))).cast("long"))
          .select(col("d"), col("dau"), col("wau7"),
            (col("dau").cast("double") / col("wau7").cast("double")).as("stickiness"))
          .orderBy("d")
      },
      oracle = Some(
        """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
          |daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau,
          |                 list(user_id) AS us
          |          FROM du GROUP BY d),
          |r AS (SELECT d, dau,
          |             CAST(len(list_distinct(flatten(
          |               list(us) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
          |                              AND CURRENT ROW)))) AS BIGINT) AS wau7
          |      FROM daily)
          |SELECT d, dau, wau7,
          |       CAST(dau AS DOUBLE) / CAST(wau7 AS DOUBLE) AS stickiness
          |FROM r ORDER BY d""".stripMargin)),

    // ---- exact 7-day rolling median of daily volumes (added r8) ----------
    // The robust trend line ops dashboards draw next to the raw series —
    // median, not mean, so a single spike day doesn't drag the baseline
    // (mad_anomalies' robustness argument applied to the ROLLING view;
    // holt_smooth is the parametric alternative). EXACT small-window
    // median, engine-version-proof: the ≤7 counts in each ROWS window are
    // collected, sorted, and the median taken as (lo + hi)/2 where lo/hi
    // are the two middle elements by INTEGER `div` indexing — int sum +
    // one dyadic halving, no percentile_approx, no engine quantile
    // semantics in play.
    //
    // Scale shape: one day-grain hash agg; the rolling window PARTITIONS
    // by event_type over that type's calendar-span-bounded day series; the
    // per-row sort is over ≤7 elements.
    "rolling_median_volume" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w7 = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(-6, 0)
        Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
          .withColumn("sl", sort_array(collect_list(col("c")).over(w7)))
          .withColumn("m", size(col("sl")).cast("long"))
          .select(col("event_type"), col("d"), col("c"),
            ((expr("element_at(sl, cast((m + 1) div 2 as int))")
              + expr("element_at(sl, cast(m div 2 + 1 as int))")).cast("double") / 2.0)
              .as("med7"))
          .orderBy("event_type", "d")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |r AS (SELECT event_type, d, c,
          |             list_sort(list(c) OVER (PARTITION BY event_type ORDER BY d
          |                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS sl
          |      FROM daily),
          |m AS (SELECT event_type, d, c, sl, CAST(len(sl) AS BIGINT) AS m FROM r)
          |SELECT event_type, d, c,
          |       CAST(sl[CAST((m + 1) // 2 AS INTEGER)]
          |            + sl[CAST(m // 2 + 1 AS INTEGER)] AS DOUBLE) / 2.0 AS med7
          |FROM m ORDER BY event_type, d""".stripMargin)),

    "daily_anomalies" -> Q(
      fn = (s, dir) => {
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("ss"),
            sum(col("c") * col("c")).as("q"))
        daily.join(broadcast(stats), Seq("event_type"))
          .withColumn("dev", (col("n") * col("c") - col("ss")).cast("decimal(38,0)"))
          .withColumn("var_n2", (col("n") * col("q") - col("ss") * col("ss")).cast("decimal(38,0)"))
          .select(col("event_type"), col("d"), col("c"),
            when(col("var_n2") === 0, lit(0.0d))
              .otherwise(col("dev").cast("double") / sqrt(col("var_n2").cast("double"))).as("z"),
            (col("dev") > 0 && col("dev") * col("dev") > lit(9) * col("var_n2"))
              .cast("int").as("is_anomaly"))
          .orderBy("event_type", "d")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |stats AS (
          |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(c) AS BIGINT) AS ss, CAST(SUM(c * c) AS BIGINT) AS q
          |  FROM daily GROUP BY event_type),
          |j AS (
          |  SELECT daily.event_type, d, c,
          |         CAST(n * c - ss AS DECIMAL(38,0)) AS dev,
          |         CAST(n * q - ss * ss AS DECIMAL(38,0)) AS var_n2
          |  FROM daily JOIN stats USING (event_type))
          |SELECT event_type, d, c,
          |       CASE WHEN var_n2 = 0 THEN 0.0
          |            ELSE CAST(dev AS DOUBLE) / sqrt(CAST(var_n2 AS DOUBLE)) END AS z,
          |       CAST(CASE WHEN dev > 0 AND dev * dev > 9 * var_n2
          |                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
          |FROM j ORDER BY event_type, d""".stripMargin)),

    // ---- inter-arrival gap quantiles per event type (added r7) -----------
    // The arrival-process characterization behind capacity planning and the
    // reference's bucket sizing: per event type, exact R-7 quantiles
    // (p50/p90/p99) of the microsecond gaps between consecutive events of
    // that type in strict (ts, event_id) order. Long-tailed p99/p50 ratios
    // mean bursty arrivals — the workload where priority buckets earn
    // their keep. Same spelled-out lerp as length_quantiles on both
    // engines; gaps are whole micros (exactly representable doubles), the
    // window/lerp arithmetic is an identical op chain, so the 6 dp round
    // rounds identical doubles.
    //
    // Scale shape: one shuffle on event_type for the lag window; the
    // per-type sorted gap list is the EXACT-quantile contract this oracle
    // checks — at production volume the drop-in replacement is
    // approx_percentile over the same gap column (sketch-mergeable, no
    // per-type list), with this query as its small-scale truth.
    "gap_quantiles" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
        def q(p: Double, name: String) = Q.grid6(expr(
          s"""gaps[int(floor($p * (size(gaps) - 1)))]
             |+ ($p * (size(gaps) - 1) - floor($p * (size(gaps) - 1)))
             |  * (gaps[int(ceil($p * (size(gaps) - 1)))]
             |     - gaps[int(floor($p * (size(gaps) - 1)))])""".stripMargin))
          .as(name)
        Tables.load(s, dir, "events")
          .withColumn("gap",
            (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).cast("double"))
          .filter(col("gap").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sort_array(collect_list(col("gap"))).as("gaps"))
          .select(col("event_type"), col("n_gaps"),
            q(0.5, "p50"), q(0.9, "p90"), q(0.99, "p99"))
          .orderBy("event_type")
      },
      oracle = Some {
        def q(p: Double, name: String) =
          s"""floor((gaps[CAST(floor($p * (len(gaps) - 1)) AS INTEGER) + 1]
             |+ ($p * (len(gaps) - 1) - floor($p * (len(gaps) - 1)))
             |  * (gaps[CAST(ceil($p * (len(gaps) - 1)) AS INTEGER) + 1]
             |     - gaps[CAST(floor($p * (len(gaps) - 1)) AS INTEGER) + 1]))
             |  * 1000000.0) / 1000000.0 AS $name"""
            .stripMargin
        s"""WITH t AS (SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |g AS (SELECT event_type,
           |        CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
           |          PARTITION BY event_type ORDER BY ts, event_id)) AS DOUBLE) AS gap
           |      FROM t),
           |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           |             list_sort(list(gap)) AS gaps
           |      FROM g WHERE gap IS NOT NULL GROUP BY event_type)
           |SELECT event_type, n_gaps, ${q(0.5, "p50")}, ${q(0.9, "p90")}, ${q(0.99, "p99")}
           |FROM a ORDER BY event_type""".stripMargin
      }),

    // ---- daily-volume lag-1 autocorrelation (added r7) -------------------
    // The time-series companion to daily_anomalies: per event type, the
    // Pearson autocorrelation of consecutive observed-day volumes (row-lag
    // over the day-ordered series — calendar gaps are treated as adjacent
    // observations, which is the standard ACF-on-observed-series reading
    // and keeps the operator total-order deterministic). r₁ ≈ 0 means
    // memoryless arrivals; r₁ → 1 means trending load the priority buckets
    // must be provisioned for, r₁ < 0 alternating/bursty days.
    //
    // Float discipline (q_stats_moments): all six sufficient statistics of
    // the (prev, cur) pair series are exact integer sums of daily counts;
    // cross terms go through DECIMAL(38,0)/HUGEINT so no float exists
    // until the final fixed cast-sqrt-multiply-divide chain, identical on
    // both engines. Degenerate constant series report 0 via an exact
    // integer CASE, not a NaN whose bit pattern engines may disagree on.
    //
    // Scale shape: daily agg shuffles once on (type, day) with map-side
    // combine; the lag window and moment agg run over ≤ |types|×|days|
    // rows — calendar-dimension tiny at any corpus size.
    "volume_autocorr" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("d"))
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val m = daily
          .withColumn("prev", lag(col("c"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("prev")).as("sa"), sum(col("prev") * col("prev")).as("saa"),
            sum(col("c")).as("sb"), sum(col("c") * col("c")).as("sbb"),
            sum(col("prev") * col("c")).as("sab"))
        val va = big(col("n")) * big(col("saa")) - big(col("sa")) * big(col("sa"))
        val vb = big(col("n")) * big(col("sbb")) - big(col("sb")) * big(col("sb"))
        val cv = (big(col("n")) * big(col("sab")) - big(col("sa")) * big(col("sb"))).cast("double")
        m.select(col("event_type"), col("n").as("n_pairs"),
            when(va === 0 || vb === 0, lit(0.0d))
              .otherwise(cv / (sqrt(va.cast("double")) * sqrt(vb.cast("double"))))
              .as("autocorr_lag1"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |p AS (
          |  SELECT event_type, c,
          |         LAG(c) OVER (PARTITION BY event_type ORDER BY d) AS prev
          |  FROM daily),
          |m AS (
          |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
          |         CAST(SUM(prev) AS HUGEINT) AS sa, CAST(SUM(prev * prev) AS HUGEINT) AS saa,
          |         CAST(SUM(c) AS HUGEINT) AS sb, CAST(SUM(c * c) AS HUGEINT) AS sbb,
          |         CAST(SUM(prev * c) AS HUGEINT) AS sab
          |  FROM p WHERE prev IS NOT NULL GROUP BY event_type)
          |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
          |       CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN 0.0
          |            ELSE CAST(n * sab - sa * sb AS DOUBLE)
          |                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
          |                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))) END AS autocorr_lag1
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- deterministic bootstrap confidence interval (added r7) ----------
    // Distributed uncertainty quantification done reproducibly: a 95% CI
    // for the mean event value per type via the Poissonized bootstrap
    // (each of B = 32 replicas weights every row by an independent
    // Poisson(1) multiplicity — the classic one-pass bootstrap for
    // distributed data, e.g. bag-of-little-bootstraps lineage). The
    // "random" draws are DETERMINISTIC: 16-bit md5 hex slices of
    // (digest-group, event_id) compared against the Poisson(1) CDF
    // thresholds pre-scaled to 16⁴ and written as 4-char lowercase hex
    // strings — lexicographic comparison ≡ numeric comparison (the
    // train_split idiom), so the multiplicity is an exact string CASE on
    // BOTH engines: no RNG state, no float draw, rerun-identical anywhere.
    // The 32 replicas draw from FOUR md5 digests per row (8 disjoint
    // 4-hex slices each — the minhash disjoint-slice trick), not 32:
    // hashing is the hot loop and this is 8× less of it (measured
    // 5 s → ~1.5 s at sf0.1); 16-bit CDF resolution biases P(k) by
    // < 2⁻¹⁶ — irrelevant against 1/√32-replica noise.
    //
    // Float parity: replica sums are exact integer (cents × multiplicity);
    // each replica mean is ONE bare division; the CI bounds are the
    // gap_quantiles lerp over the 32 sorted replica means (identical op
    // chain). The point estimate is one bare division of exact ints.
    //
    // Scale shape: the 32× replica fan-out is map-side (4 digests computed
    // per ROW, then an explode feeding a partial agg that collapses to
    // ≤ |types|×32 rows per partition before the shuffle); the per-type
    // sorted list holds exactly 32 doubles. ONE corpus pass total (r16,
    // guide §2.3/§2.4): the point estimate's Σc and row count are constant
    // across replicas — every row appears once in every b — so they ride
    // the replica aggregation (two extra map-side sum columns) and the
    // old second corpus scan + join-back is gone; per (type, b) group
    // they are the identical integers, so max() over b reproduces the old
    // pass's exact values bit-for-bit.
    "bootstrap_mean_ci" -> Q(
      fn = (s, dir) => {
        // P(Poisson(1) ≤ k)·16⁴ as zero-padded hex, k = 0..6; mult 7 beyond
        val th = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9", "fffa")
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("c"))
        val digests = array((0 until 4).map(g =>
          md5(concat(lit(s"boot:$g:"), col("event_id").cast("string")))): _*)
        val h4 = expr("substring(ds[int(b div 8)], (b % 8) * 4 + 1, 4)")
        val mult = th.zipWithIndex.foldRight(lit(7L)) { case ((t, k), rest) =>
          when(h4 < t, k.toLong).otherwise(rest)
        }
        val reps = e.withColumn("ds", digests)
          .withColumn("b", explode(sequence(lit(0), lit(31))))
          .withColumn("mult", mult)
          .groupBy("event_type", "b")
          .agg(sum(col("mult") * col("c")).as("sm"), sum(col("mult")).as("n"),
            sum(col("c")).as("sc"), count(lit(1)).as("cnt"))
          .select(col("event_type"),
            (col("sm").cast("double") / (col("n") * 100L).cast("double")).as("mb"),
            col("sc"), col("cnt"))
          .groupBy("event_type")
          .agg(sort_array(collect_list(col("mb"))).as("ms"),
            max(col("cnt")).as("n_events"), max(col("sc")).as("sc"))
        def lerp(p: Double, name: String) = Q.grid6(expr(
          s"""ms[int(floor($p * (size(ms) - 1)))]
             |+ ($p * (size(ms) - 1) - floor($p * (size(ms) - 1)))
             |  * (ms[int(ceil($p * (size(ms) - 1)))]
             |     - ms[int(floor($p * (size(ms) - 1)))])""".stripMargin))
          .as(name)
        reps
          .select(col("event_type"), col("n_events"),
            (col("sc").cast("double")
              / (col("n_events") * 100L).cast("double")).as("mean"),
            lerp(0.025, "ci_lo"), lerp(0.975, "ci_hi"))
          .orderBy("event_type")
      },
      oracle = Some {
        val th = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9", "fffa")
        val cases = th.zipWithIndex
          .map { case (t, k) => s"WHEN h4 < '$t' THEN $k" }.mkString(" ")
        def lerp(p: Double, name: String) =
          s"""floor((ms[CAST(floor($p * (len(ms) - 1)) AS INTEGER) + 1]
             |+ ($p * (len(ms) - 1) - floor($p * (len(ms) - 1)))
             |  * (ms[CAST(ceil($p * (len(ms) - 1)) AS INTEGER) + 1]
             |     - ms[CAST(floor($p * (len(ms) - 1)) AS INTEGER) + 1]))
             |  * 1000000.0) / 1000000.0 AS $name"""
            .stripMargin
        s"""WITH e AS (SELECT event_type, event_id,
           |                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           |           FROM events),
           |r AS (SELECT event_type, event_id, c, UNNEST(range(0, 32)) AS b FROM e),
           |m AS (SELECT event_type, b, c,
           |             substring(md5(concat('boot:', CAST(b // 8 AS VARCHAR), ':',
           |                                  CAST(event_id AS VARCHAR))),
           |                       CAST((b % 8) * 4 + 1 AS INTEGER), 4) AS h4
           |      FROM r),
           |rb AS (SELECT event_type, b,
           |              CAST(SUM((CASE $cases ELSE 7 END) * c) AS DOUBLE)
           |                / CAST(SUM(CASE $cases ELSE 7 END) * 100 AS DOUBLE) AS mb
           |       FROM m GROUP BY event_type, b),
           |ms AS (SELECT event_type, list_sort(list(mb)) AS ms FROM rb GROUP BY event_type),
           |pt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           |              CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) * 100 AS DOUBLE) AS mean
           |       FROM e GROUP BY event_type)
           |SELECT event_type, n_events, mean, ${lerp(0.025, "ci_lo")}, ${lerp(0.975, "ci_hi")}
           |FROM pt JOIN ms USING (event_type)
           |ORDER BY event_type""".stripMargin
      }),

    // ---- hour-of-day seasonality profile (added r7) ----------------------
    // The diurnal load curve per event type — what capacity planning and
    // the priority buckets' allocation percentages are actually sized
    // from: per (type, hour-of-day UTC) counts, each hour's share of the
    // type's traffic, and the peak hour flagged (deterministic argmax:
    // count DESC, hour ASC — a rank over the ≤ 24-row per-type frame, the
    // benign bounded-window shape). Share is one bare division of exact
    // ints; no other float exists.
    //
    // Scale shape: ONE (type, hour) hash agg with map-side combine to
    // ≤ |types|×24 rows; everything downstream (totals, rank) runs on
    // that constant-size frame.
    "seasonality_profile" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("n").desc, col("hour"))
        val byHour = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))
        val totals = byHour.groupBy("event_type").agg(sum(col("n")).as("tot"))
        byHour.join(broadcast(totals), Seq("event_type"))
          // ≤ 24 rows per type: the rank window is bounded by the clock,
          // not the data
          .withColumn("is_peak", (row_number().over(w) === 1).cast("int"))
          .select(col("event_type"), col("hour"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("share"),
            col("is_peak"))
          .orderBy("event_type", "hour")
      },
      oracle = Some(
        """WITH h AS (
          |  SELECT event_type,
          |         CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
          |         CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM h GROUP BY event_type),
          |r AS (SELECT h.event_type, hour, n, tot,
          |             ROW_NUMBER() OVER (PARTITION BY h.event_type
          |                                ORDER BY n DESC, hour) AS rk
          |      FROM h JOIN t USING (event_type))
          |SELECT event_type, hour, n,
          |       CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
          |       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_peak
          |FROM r ORDER BY event_type, hour""".stripMargin)),

    // ---- gaps-and-islands: per-user active-day streaks (added r8) --------
    // The classic sessionization-at-day-grain pattern: collapse each
    // user's distinct active days into maximal runs of CONSECUTIVE days
    // (islands) via the date − row_number() anchor — consecutive days
    // share an anchor, any gap starts a new one. Feeds engagement-streak
    // features (current/longest streak) that retention_cohorts' fixed-day
    // matrix can't express. Hashed surface is all ints and dates — no
    // float anywhere. Scale shape: the only window is PARTITIONED by
    // user_id over that user's distinct days (bounded by the calendar
    // span, never corpus rows); one distinct-agg + one island agg, both
    // keyed shuffles on user_id that AQE coalesces.
    "gaps_islands" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val days = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
        days
          .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
          .groupBy(col("user_id"), col("anchor"))
          .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
            count(lit(1)).as("len_days"))
          .select(col("user_id"), col("streak_start"), col("streak_end"),
            col("len_days"))
          .orderBy("user_id", "streak_start")
      },
      oracle = Some(
        """WITH days AS (
          |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
          |anch AS (
          |  SELECT user_id, d,
          |         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
          |                  AS INTEGER) AS anchor
          |  FROM days)
          |SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
          |       CAST(COUNT(*) AS BIGINT) AS len_days
          |FROM anch GROUP BY user_id, anchor
          |ORDER BY user_id, streak_start""".stripMargin)),

    // ---- single change-point on the daily volume series (added r8) -------
    // Binary-segmentation step 1 (the CUSUM/Pettitt workhorse): for every
    // candidate split t of the day-ordered total-volume series, the
    // between-segment sum-of-squares reduction
    //   R(t) = (S_t·n − S·t)² / (t·(n−t)·n)
    // (prefix sum S_t, total S, n days) — the day whose split best
    // explains the series as two levels. Complements cusum_drift
    // (sequential detector) with the retrospective argmax form.
    // ENGINE-VERSION-PROOF: the numerator/denominator are exact int64
    // cross-products widened to DECIMAL(38,0) (daily_anomalies
    // discipline); `score` is ONE bare IEEE division of exact ints and
    // `is_best` is decided by exact integer cross-multiplication
    // R(t) ≥ R(u) ⇔ A_t²·d_u ≥ A_u²·d_t — no float reaches the verdict.
    // The argmax is a broadcast anti-join of the candidate frame against
    // itself under that exact comparison (R1-whitelisted: BOTH sides are
    // the day-grain aggregate, calendar-span bounded — never corpus rows).
    // Scale shape: the series is the DAY-GRAIN aggregate (calendar-span
    // bounded, R2-whitelisted like survival_km); the corpus pass is one
    // hash agg.
    "changepoint_daily" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val wOrd = Window.orderBy(col("d"))
        val totals = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        val cand = daily
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("st", sum(col("c")).over(wOrd))
          .crossJoin(broadcast(totals))
          .filter(col("t") < col("n"))
          .withColumn("a", (col("st") * col("n") - col("s") * col("t"))
            .cast("decimal(38,0)"))
          .withColumn("num", (col("a") * col("a")).cast("decimal(38,0)"))
          .withColumn("den", (col("t") * (col("n") - col("t")) * col("n"))
            .cast("decimal(38,0)"))
          // no cache: all three consumers sit over the SAME day-grain
          // shuffle, so ReusedExchange runs the corpus scan once
          .select(col("d"), col("c"), col("t"), col("num"), col("den"))
        val rivals = cand.select(col("num").as("onum"), col("den").as("oden"))
        val best = cand
          .join(broadcast(rivals),
            col("onum") * col("den") > col("num") * col("oden"), "left_anti")
          .select(col("d").as("bd"), lit(1).as("is_best"))
        cand.join(broadcast(best), col("d") === col("bd"), "left")
          .select(col("d"), col("c"), col("t"),
            (col("num").cast("double") / col("den").cast("double")).as("score"),
            coalesce(col("is_best"), lit(0)).cast("int").as("is_best"))
          .orderBy("d")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1),
          |pre AS (
          |  SELECT d, c,
          |         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
          |         CAST(SUM(c) OVER (ORDER BY d) AS BIGINT) AS st,
          |         CAST(COUNT(*) OVER () AS BIGINT) AS n,
          |         CAST(SUM(c) OVER () AS BIGINT) AS s
          |  FROM daily),
          |cand AS (
          |  SELECT d, c, t,
          |         CAST(st * n - s * t AS DECIMAL(38,0)) AS a,
          |         CAST(t * (n - t) * n AS DECIMAL(38,0)) AS den
          |  FROM pre WHERE t < n),
          |sc AS (SELECT d, c, t, CAST(a * a AS DECIMAL(38,0)) AS num, den FROM cand)
          |SELECT d, c, t,
          |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS score,
          |       CAST(CASE WHEN NOT EXISTS (
          |              SELECT 1 FROM sc o
          |              WHERE o.num * sc.den > sc.num * o.den)
          |            THEN 1 ELSE 0 END AS INTEGER) AS is_best
          |FROM sc ORDER BY d""".stripMargin)),

    // ---- multi-lag autocorrelation profile (added r9) ---------------------
    // volume_autocorr generalized from lag 1 to the profile {1, 2, 3, 7}:
    // the lag-7 row is the weekly-seasonality detector (a strong ACF(7)
    // with weak ACF(1..3) = day-of-week cycle, exactly what
    // seasonality_profile sees in hour-grain and holt_smooth's trend term
    // smooths over), and the 1-vs-2-vs-3 decay shape separates trending
    // (slow decay) from mean-reverting (alternating sign) load. Same exact
    // integer sufficient statistics and fixed IEEE chain as
    // volume_autocorr — each (type, lag) leg's Pearson r over the
    // day-ordered pairs, DECIMAL(38,0)/HUGEINT cross terms, constant
    // series report 0 via the exact integer CASE.
    //
    // Scale shape: ONE (type-keyed) window exchange computes all four lag
    // columns (one sort, four frames), stack() unpivots map-side, and the
    // (type, lag) agg collapses to ≤ |types|×4 rows — the whole query past
    // the day-grain aggregate is calendar-bounded.
    "acf_lags" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val lagged = daily
          .withColumn("p1", lag(col("c"), 1).over(w))
          .withColumn("p2", lag(col("c"), 2).over(w))
          .withColumn("p3", lag(col("c"), 3).over(w))
          .withColumn("p7", lag(col("c"), 7).over(w))
          .select(col("event_type"), col("c"),
            expr("stack(4, 1L, p1, 2L, p2, 3L, p3, 7L, p7) as (lag, prev)"))
          .filter(col("prev").isNotNull)
        val m = lagged.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n"),
            sum(col("prev")).as("sa"), sum(col("prev") * col("prev")).as("saa"),
            sum(col("c")).as("sb"), sum(col("c") * col("c")).as("sbb"),
            sum(col("prev") * col("c")).as("sab"))
        val va = big(col("n")) * big(col("saa")) - big(col("sa")) * big(col("sa"))
        val vb = big(col("n")) * big(col("sbb")) - big(col("sb")) * big(col("sb"))
        val cv = (big(col("n")) * big(col("sab")) - big(col("sa")) * big(col("sb")))
          .cast("double")
        m.select(col("event_type"), col("lag"), col("n").as("n_pairs"),
            when(va === 0 || vb === 0, lit(0.0d))
              .otherwise(cv / (sqrt(va.cast("double")) * sqrt(vb.cast("double"))))
              .as("acf"))
          .orderBy("event_type", "lag")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |lagged AS (
          |  SELECT event_type, c,
          |         LAG(c, 1) OVER (PARTITION BY event_type ORDER BY d) AS p1,
          |         LAG(c, 2) OVER (PARTITION BY event_type ORDER BY d) AS p2,
          |         LAG(c, 3) OVER (PARTITION BY event_type ORDER BY d) AS p3,
          |         LAG(c, 7) OVER (PARTITION BY event_type ORDER BY d) AS p7
          |  FROM daily),
          |st AS (
          |  SELECT event_type, CAST(1 AS BIGINT) AS lag, p1 AS prev, c FROM lagged
          |  UNION ALL
          |  SELECT event_type, 2, p2, c FROM lagged
          |  UNION ALL
          |  SELECT event_type, 3, p3, c FROM lagged
          |  UNION ALL
          |  SELECT event_type, 7, p7, c FROM lagged),
          |m AS (
          |  SELECT event_type, lag, CAST(COUNT(*) AS HUGEINT) AS n,
          |         CAST(SUM(prev) AS HUGEINT) AS sa,
          |         CAST(SUM(prev * prev) AS HUGEINT) AS saa,
          |         CAST(SUM(c) AS HUGEINT) AS sb,
          |         CAST(SUM(c * c) AS HUGEINT) AS sbb,
          |         CAST(SUM(prev * c) AS HUGEINT) AS sab
          |  FROM st WHERE prev IS NOT NULL GROUP BY event_type, lag)
          |SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
          |       CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN 0.0
          |            ELSE CAST(n * sab - sa * sb AS DOUBLE)
          |                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
          |                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))) END AS acf
          |FROM m ORDER BY event_type, lag""".stripMargin)),

    // ---- Ljung-Box whiteness test over the ACF profile (added r13) -------
    // acf_lags reports the autocorrelations; this is the PORTMANTEAU test
    // that reads them as one number (Ljung & Box 1978): Q = n(n+2)
    // Σ_{k=1..7} r_k²/(n−k) against χ²₇ — "is daily volume white noise,
    // or is there structure worth modeling?" — the standard pre-flight
    // before fitting holt_smooth/granger. EXACT surface: autocovariances
    // ride the n-scaled centered grid y_t = n·c_t − S (multiplying the
    // mean out instead of dividing), so C_k = Σ y_t y_{t−k} and
    // C_0 = Σ y_t² are exact DECIMAL(38,0) integers and r_k = C_k/C_0
    // exactly (the n² scales cancel). Q is then a FIXED per-row expression
    // tree over those exact ints — (C_k/C_0)²/(n−k) left-fold-summed
    // k = 1..7, spelled identically in both engines: a scalar IEEE chain
    // on one row per type has no aggregation-order freedom, so it is
    // bit-identical cross-engine (the cohen_d doctrine). C_0 = 0
    // (constant series) → NULL, the levene convention.
    //
    // LAG CONVENTION (r14, the acf_lags row-lag convention): lag k is a
    // ROW offset over the per-type OBSERVED-day series ordered by date —
    // a missing calendar day makes its neighbors adjacent rather than
    // zero-filling the gap. On the gate corpus every (type, day) cell is
    // populated so row-lag ≡ day-lag; on a sparse series this tests
    // whiteness of the observed sequence, not of the zero-filled daily
    // grid (densify upstream if the latter is wanted).
    //
    // Scale shape: day-grain agg → per-type 1-row moment broadcast → ONE
    // type-partitioned lag window (day-grain-bounded) → ≤|types| roll-up.
    "ljung_box" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val daily = Tables.load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val tot = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        val y = daily.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("d"), col("n"),
            (big(col("n")) * col("c") - col("sc")).as("y"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val lagged = (1 to 7).foldLeft(y) { (df, k) =>
          df.withColumn(s"y$k", lag(col("y"), k).over(w))
        }
        val aggs = Seq(first(col("n")).as("n"),
            sum(col("y") * col("y")).as("c0")) ++
          (1 to 7).map(k =>
            sum(when(col(s"y$k").isNotNull, col("y") * col(s"y$k"))
              .otherwise(lit(0))).as(s"ck$k"))
        val cks = lagged.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
        val qsum = (1 to 7).map { k =>
          ((col(s"ck$k").cast("double") / col("c0").cast("double"))
            * (col(s"ck$k").cast("double") / col("c0").cast("double")))
            ./((col("n") - k).cast("double"))
        }.reduce(_ + _)
        cks.filter(col("n") > 7)
          .select(col("event_type"), col("n").as("n_days"),
            when(expr("c0 = 0"), lit(null).cast("double"))
              .otherwise((col("n") * (col("n") + 2)).cast("double") * qsum)
              .as("q_lb"))
          .select(col("event_type"), col("n_days"), col("q_lb"),
            coalesce(col("q_lb") > 14.067, lit(false)).as("structure_flag"))
          .orderBy("event_type")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
          |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |               CAST(SUM(c) AS BIGINT) AS sc
          |        FROM daily GROUP BY event_type),
          |y AS (SELECT d.event_type, d.d, t.n,
          |             CAST(t.n AS HUGEINT) * d.c - t.sc AS y
          |      FROM daily d JOIN tot t ON d.event_type = t.event_type),
          |lagged AS (
          |  SELECT event_type, n, y,
          |         LAG(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1,
          |         LAG(y, 2) OVER (PARTITION BY event_type ORDER BY d) AS y2,
          |         LAG(y, 3) OVER (PARTITION BY event_type ORDER BY d) AS y3,
          |         LAG(y, 4) OVER (PARTITION BY event_type ORDER BY d) AS y4,
          |         LAG(y, 5) OVER (PARTITION BY event_type ORDER BY d) AS y5,
          |         LAG(y, 6) OVER (PARTITION BY event_type ORDER BY d) AS y6,
          |         LAG(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS y7
          |  FROM y),
          |cks AS (
          |  SELECT event_type, MAX(n) AS n,
          |         SUM(y * y) AS c0,
          |         SUM(CASE WHEN y1 IS NOT NULL THEN y * y1 ELSE 0 END) AS ck1,
          |         SUM(CASE WHEN y2 IS NOT NULL THEN y * y2 ELSE 0 END) AS ck2,
          |         SUM(CASE WHEN y3 IS NOT NULL THEN y * y3 ELSE 0 END) AS ck3,
          |         SUM(CASE WHEN y4 IS NOT NULL THEN y * y4 ELSE 0 END) AS ck4,
          |         SUM(CASE WHEN y5 IS NOT NULL THEN y * y5 ELSE 0 END) AS ck5,
          |         SUM(CASE WHEN y6 IS NOT NULL THEN y * y6 ELSE 0 END) AS ck6,
          |         SUM(CASE WHEN y7 IS NOT NULL THEN y * y7 ELSE 0 END) AS ck7
          |  FROM lagged GROUP BY event_type),
          |m AS (
          |  SELECT event_type, n AS n_days, c0,
          |         CASE WHEN c0 = 0 THEN NULL
          |              ELSE CAST(n * (n + 2) AS DOUBLE)
          |                   * ((CAST(ck1 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck1 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 1 AS DOUBLE)
          |                    + (CAST(ck2 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck2 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 2 AS DOUBLE)
          |                    + (CAST(ck3 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck3 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 3 AS DOUBLE)
          |                    + (CAST(ck4 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck4 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 4 AS DOUBLE)
          |                    + (CAST(ck5 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck5 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 5 AS DOUBLE)
          |                    + (CAST(ck6 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck6 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 6 AS DOUBLE)
          |                    + (CAST(ck7 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      * (CAST(ck7 AS DOUBLE) / CAST(c0 AS DOUBLE))
          |                      / CAST(n - 7 AS DOUBLE)) END AS q_lb
          |  FROM cks WHERE n > 7)
          |SELECT event_type, n_days, q_lb,
          |       COALESCE(q_lb > 14.067, false) AS structure_flag
          |FROM m ORDER BY event_type""".stripMargin)),

    // ---- stationary distribution of the event Markov chain (added r9) ----
    // Where transition_matrix models ONE step, the stationary distribution
    // π (the chain's long-run occupancy) is what the priority buckets'
    // steady-state load actually converges to: π ≈ empirical share means
    // the stream is near mixing equilibrium; a gap (a type over-represented
    // in π vs its observed share) means the chain predicts traffic drift
    // toward that type — the forward-looking companion of type_drift's
    // retrospective KL. Computed as 12 unrolled power-iteration steps from
    // the uniform vector (the attribution_markov finite-semantics rule: a
    // fixed iteration count is a DEFINED quantity, a convergence test is
    // an engine-dependent guess).
    //
    // ENGINE-VERSION-PROOF: transitions on the exact 10⁻⁶ integer grid
    // (p6 = c·10⁶ div tot — transition_matrix's counts), π carried as
    // exact int64 micro-units, each step π'(j) = Σ_i (π6(i)·p6(i,j)) div
    // 10⁶ with per-term floor — pure integer arithmetic, bit-identical
    // anywhere; the reported doubles are ONE bare division each.
    //
    // Scale shape: ONE user_id window exchange builds the edge counts
    // (transition_matrix's plan); everything after is ≤|types|² rows — the
    // 12 steps are 12 joins over broadcast-tiny frames, constant cost at
    // any corpus size.
    //
    // r16 (guide §2.3): `states` and the event total are DERIVED from emp
    // (its keys are exactly the distinct types; Σ n_ev is exactly
    // count(*)), so the separate distinct pass and global-count pass
    // become re-references of ONE aggregate subtree that runtime exchange
    // reuse dedups — two corpus scans removed. The 12 iteration branches
    // stay LAZY over p6 exactly like r15: an eager checkpoint of p6 was
    // TRIED and measured 2.3× slower at the sf1 decade (5.8 s vs 2.5 s,
    // min-of-3) — the checkpoint barrier serializes the corpus window
    // pass against the emp aggregate scans that AQE otherwise runs as
    // concurrent stages of the one job, and exchange reuse already
    // collapses the 12 p6 references at runtime (the pcaVector
    // de-truncation lesson, in reverse).
    "markov_stationary" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ev = Tables.load(s, dir, "events")
        val seq0 = ev
          .select(col("user_id"), col("event_type").as("cur"),
            lead(col("event_type"), 1).over(w).as("nxt"))
          .filter(col("nxt").isNotNull)
        val p = seq0.groupBy("cur", "nxt").agg(count(lit(1)).as("cnt"))
        val tot = p.groupBy("cur").agg(sum(col("cnt")).as("tot"))
        // everything LAZY (see the scale note above); emp also stays a lazy
        // aggregate so the PlanGuard R2 global-window bound remains visible
        // in the plan (a checkpoint would hide that `states` is
        // |types|-bounded)
        val p6 = p.join(broadcast(tot), Seq("cur"))
          .select(col("cur"), col("nxt"), expr("(cnt * 1000000L) div tot").as("p6"))
        val emp = ev.groupBy(col("event_type").as("state"))
          .agg(count(lit(1)).as("n_ev"))
        val states = emp.select(col("state"))
        // deterministic uniform start: 10^6 split evenly, remainder to the
        // lexicographically first states
        val ws = Window.orderBy(col("state"))
        val init = states
          .withColumn("rn", row_number().over(ws).cast("long"))
          .withColumn("ns", count(lit(1)).over(Window.partitionBy()))
          .select(col("state"),
            (expr("1000000L div ns")
              + when(col("rn") <= expr("1000000L % ns"), 1L).otherwise(0L))
              .as("pi6"))
        var pi = init
        for (_ <- 1 to 12) {
          pi = p6.join(pi, p6("cur") === pi("state"))
            .groupBy(col("nxt").as("state2"))
            .agg(sum(expr("(pi6 * p6) div 1000000L")).as("pi6"))
            .select(col("state2").as("state"), col("pi6"))
        }
        val nTot = emp.agg(sum(col("n_ev")).as("n_all"))
        states.join(pi, Seq("state"), "left").na.fill(0L, Seq("pi6"))
          .join(emp, Seq("state"), "left").na.fill(0L, Seq("n_ev"))
          .crossJoin(broadcast(nTot))
          .select(col("state"), col("pi6"),
            (col("pi6").cast("double") / lit(1000000.0d)).as("pi"),
            expr("(n_ev * 1000000L) div n_all").as("empirical6"),
            (col("n_ev").cast("double") / col("n_all").cast("double"))
              .as("empirical_share"))
          .orderBy("state")
      },
      oracle = Some {
        val steps = (1 to 12).map { i =>
          val prev = if (i == 1) "s0" else s"s${i - 1}"
          s"""s$i AS (
             |  SELECT p.nxt AS state,
             |         CAST(SUM((pr.pi6 * p.p6) // 1000000) AS BIGINT) AS pi6
             |  FROM $prev pr JOIN p6 p ON p.cur = pr.state
             |  GROUP BY p.nxt)""".stripMargin
        }.mkString(",\n")
        s"""WITH seq0 AS (
           |  SELECT event_type AS cur,
           |         LEAD(event_type) OVER (PARTITION BY user_id
           |                                ORDER BY ts, event_id) AS nxt
           |  FROM events),
           |p AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
           |      FROM seq0 WHERE nxt IS NOT NULL GROUP BY cur, nxt),
           |t AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS tot FROM p GROUP BY cur),
           |p6 AS (SELECT p.cur, p.nxt, (cnt * 1000000) // tot AS p6
           |       FROM p JOIN t USING (cur)),
           |states AS (SELECT DISTINCT event_type AS state FROM events),
           |s0 AS (
           |  SELECT state,
           |         1000000 // (SELECT COUNT(*) FROM states)
           |           + CASE WHEN CAST(ROW_NUMBER() OVER (ORDER BY state) AS BIGINT)
           |                       <= 1000000 % (SELECT COUNT(*) FROM states)
           |                  THEN 1 ELSE 0 END AS pi6
           |  FROM states),
           |$steps,
           |emp AS (SELECT event_type AS state, CAST(COUNT(*) AS BIGINT) AS n_ev
           |        FROM events GROUP BY event_type),
           |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM events)
           |SELECT st.state, COALESCE(s12.pi6, 0) AS pi6,
           |       CAST(COALESCE(s12.pi6, 0) AS DOUBLE) / 1000000.0 AS pi,
           |       (COALESCE(emp.n_ev, 0) * 1000000) // na.n_all AS empirical6,
           |       CAST(COALESCE(emp.n_ev, 0) AS DOUBLE)
           |         / CAST(na.n_all AS DOUBLE) AS empirical_share
           |FROM states st
           |LEFT JOIN s12 ON st.state = s12.state
           |LEFT JOIN emp ON st.state = emp.state, na
           |ORDER BY st.state""".stripMargin
      }),

    // ---- weekly growth accounting: user lifecycle states (added r9) -------
    // The canonical growth-accounting decomposition (new / retained /
    // resurrected / churning) every DAU-style dashboard is built on —
    // retention_cohorts follows ONE cohort forward, this classifies EVERY
    // active user per calendar week by where they came from:
    //   new         = first-ever active week,
    //   retained    = also active the immediately previous week,
    //   resurrected = active before, but not last week;
    // and churn_next = active this week, silent the next (only counted
    // when a next week exists in the corpus — the honest right-censoring
    // cut, survival_km's argument). Identity n_active = new + retained +
    // resurrected holds by construction and is spec-pinned. Weeks are
    // Monday date_trunc (the cohort_ltv cross-engine precedent); all
    // outputs exact counts, zero float surface.
    //
    // Scale shape: one (user, week) distinct agg, then ALL user-ordered
    // windows (first/lag/lead) share ONE user_id exchange; the week
    // roll-up collapses to ≤ calendar-weeks rows; the 1-row max-week
    // broadcast is R1-whitelisted.
    "lifecycle_states" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val uw = Tables.load(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
        val maxW = uw.agg(max(col("wk")).as("max_wk"))
        val lab = uw
          .withColumn("first_wk", min(col("wk")).over(
            Window.partitionBy(col("user_id"))))
          .withColumn("prev_wk", lag(col("wk"), 1).over(w))
          .withColumn("next_wk", lead(col("wk"), 1).over(w))
          .crossJoin(broadcast(maxW))
        lab.groupBy(col("wk"))
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L)).as("n_new"),
            sum(when(col("prev_wk").isNotNull
              && datediff(col("wk"), col("prev_wk")) === 7, 1L).otherwise(0L))
              .as("n_retained"),
            sum(when(col("prev_wk").isNotNull
              && datediff(col("wk"), col("prev_wk")) > 7, 1L).otherwise(0L))
              .as("n_resurrected"),
            sum(when(col("wk") < col("max_wk")
              && (col("next_wk").isNull || datediff(col("next_wk"), col("wk")) > 7),
              1L).otherwise(0L)).as("n_churn_next"))
          .orderBy("wk")
      },
      oracle = Some(
        """WITH uw AS (
          |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
          |  FROM events),
          |mx AS (SELECT MAX(wk) AS max_wk FROM uw),
          |lab AS (
          |  SELECT user_id, wk,
          |         MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
          |         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
          |         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
          |  FROM uw)
          |SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
          |       CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
          |       CAST(SUM(CASE WHEN prev_wk IS NOT NULL
          |                      AND datediff('day', prev_wk, wk) = 7
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
          |       CAST(SUM(CASE WHEN prev_wk IS NOT NULL
          |                      AND datediff('day', prev_wk, wk) > 7
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
          |       CAST(SUM(CASE WHEN wk < mx.max_wk
          |                      AND (next_wk IS NULL
          |                           OR datediff('day', wk, next_wk) > 7)
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churn_next
          |FROM lab, mx GROUP BY wk ORDER BY wk""".stripMargin)),

    // ---- session duration profile by day-of-week (added r9) ---------------
    // The session-QUALITY axis the session family still lacked:
    // session_paths mines what journeys LOOK like, q_session_window counts
    // them — this measures how LONG engagement lasts and when: per
    // day-of-week of the session's first event (the staffing/capacity
    // grain), session count, events per session, mean duration and exact
    // nearest-rank p50/p90 duration in whole microseconds. Sessions are
    // the SAME 30-minute-gap rule as session_paths (gap ≥ 1800 s starts a
    // new session), so the two operators provably segment identically.
    // Day-of-week via Spark weekday() ≡ DuckDB isodow−1 (the welch_ttest
    // mapping precedent, 0 = Monday). Zero-event... single-event sessions
    // have duration 0 — included (they are the bounce-rate mass).
    //
    // Float parity: durations are exact integer micros; mean is ONE bare
    // division; p50/p90 are integer order statistics (nearest-rank, the
    // user_ltv_quantiles contract; approx_percentile is the documented
    // 100 TB drop-in).
    //
    // Scale shape: ONE user_id window exchange builds sid (session_paths'
    // own plan), the (user, sid) agg reuses that partitioning prefix; the
    // dow roll-up is 7 rows with a per-dow sorted duration list bounded by
    // sessions/dow — at 100 TB swap the exact list for approx_percentile.
    "session_duration_profile" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        val sess = Tables.load(s, dir, "events")
          .withColumn("brk",
            when(lag(col("ts"), 1).over(wOrd).isNull
              || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd))
                   >= 1800L * 1000000L, 1).otherwise(0))
          .withColumn("sid", sum(col("brk")).over(wRun))
          .groupBy("user_id", "sid")
          .agg(min(unix_micros(col("ts"))).as("t0"),
            max(unix_micros(col("ts"))).as("t1"),
            count(lit(1)).as("n_ev"),
            min(col("ts")).as("start_ts"))
          .select(weekday(to_date(col("start_ts"))).cast("long").as("dow"),
            (col("t1") - col("t0")).as("dur_us"), col("n_ev"))
        sess.groupBy("dow")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).as("n_events"),
            sum(col("dur_us")).as("sum_dur_us"),
            sort_array(collect_list(col("dur_us"))).as("arr"))
          .select(col("dow"), col("n_sessions"), col("n_events"),
            (col("sum_dur_us").cast("double") / col("n_sessions").cast("double"))
              .as("mean_dur_us"),
            expr("element_at(arr, int((n_sessions + 1) div 2))").as("p50_dur_us"),
            expr("element_at(arr, int((n_sessions * 9 + 9) div 10))").as("p90_dur_us"))
          .orderBy("dow")
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT user_id, ts, event_id,
          |         CASE WHEN LAG(ts) OVER w IS NULL
          |               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
          |                  >= 1800 * 1000000 THEN 1 ELSE 0 END AS brk
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sid AS (
          |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                           ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM g),
          |sess AS (
          |  SELECT user_id, sid,
          |         CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0,
          |         CAST(MAX(epoch_us(ts)) AS BIGINT) AS t1,
          |         CAST(COUNT(*) AS BIGINT) AS n_ev,
          |         MIN(ts) AS start_ts
          |  FROM sid GROUP BY user_id, sid),
          |d AS (SELECT CAST(isodow(CAST(start_ts AS DATE)) - 1 AS BIGINT) AS dow,
          |             t1 - t0 AS dur_us, n_ev
          |      FROM sess),
          |m AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_sessions,
          |             CAST(SUM(n_ev) AS BIGINT) AS n_events,
          |             CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
          |             list_sort(list(dur_us)) AS arr
          |      FROM d GROUP BY dow)
          |SELECT dow, n_sessions, n_events,
          |       CAST(sum_dur_us AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS mean_dur_us,
          |       arr[CAST((n_sessions + 1) // 2 AS INTEGER)] AS p50_dur_us,
          |       arr[CAST((n_sessions * 9 + 9) // 10 AS INTEGER)] AS p90_dur_us
          |FROM m ORDER BY dow""".stripMargin)),

    // ---- classical seasonal decomposition: weekly indices (added r9) ------
    // The additive decomposition volume = trend + seasonal + residual at
    // its classical construction (the statsmodels/STL-step-one recipe):
    // trend = centered 7-day moving average (full windows only — edges
    // excluded, the honest boundary), seasonal index per day-of-week =
    // mean detrended deviation. The EXPLICIT day-of-week effect
    // seasonality_profile sees at hour grain and acf_lags detects at
    // lag 7 — here quantified in events/day units, the number a capacity
    // plan subtracts before sizing for trend. ALL-INTEGER surface: the
    // centered window keeps the 7-day SUM (no ÷7), deviations are
    // n-scaled d7 = 7·c − sum7 exact ints, and the reported index is the
    // ONE bare division Σd7/(7·n_dow). Σ over all full-window days of d7
    // telescopes toward 0 (spec pins the near-zero identity: seasonal
    // indices sum to ≈ 0 weighted by day counts).
    //
    // Scale shape: one day-grain hash agg; the centered ROWS window is
    // global but runs over the calendar-span-bounded aggregate (the
    // changepoint_daily R2 argument); the dow roll-up is 7 rows.
    "classical_decomposition" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
        daily
          .withColumn("sum7", sum(col("c")).over(w7))
          .withColumn("cnt7", count(lit(1)).over(w7))
          .filter(col("cnt7") === 7)
          .select(weekday(col("d")).cast("long").as("dow"),
            (col("c") * 7 - col("sum7")).as("d7"))
          .groupBy("dow")
          .agg(count(lit(1)).as("n_days"), sum(col("d7")).as("d7_sum"))
          .select(col("dow"), col("n_days"), col("d7_sum"),
            (col("d7_sum").cast("double") / (col("n_days") * 7L).cast("double"))
              .as("seasonal_index"))
          .orderBy("dow")
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY CAST(ts AS DATE)),
          |ma AS (
          |  SELECT d, c,
          |         SUM(c) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          |           AS sum7,
          |         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          |           AS cnt7
          |  FROM daily),
          |dev AS (SELECT CAST(isodow(d) - 1 AS BIGINT) AS dow,
          |               c * 7 - sum7 AS d7
          |        FROM ma WHERE cnt7 = 7),
          |m AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
          |             CAST(SUM(d7) AS BIGINT) AS d7_sum
          |      FROM dev GROUP BY dow)
          |SELECT dow, n_days, d7_sum,
          |       CAST(d7_sum AS DOUBLE) / CAST(n_days * 7 AS DOUBLE) AS seasonal_index
          |FROM m ORDER BY dow""".stripMargin)),

    // ---- seasonal strength of the weekly cycle (added r10) -----------------
    // HOW MUCH of daily-volume variation the day-of-week effect explains:
    // classical_decomposition produces the per-dow indices; this reports
    // the variance decomposition η² = SS_dow / SS_total over the SAME
    // n-scaled integer deviations d7 = 7c − sum7 (spelled verbatim), plus
    // the one-way F — the Hyndman "strength of seasonality" dial that says
    // whether a capacity plan should bother with dow-aware sizing. Exact
    // through the anova_length_by_source discipline: per-dow sufficient
    // stats are int64, the Q fold runs over the sorted ≤7-row dow frame
    // (deterministic order), and η²/F are fixed chains of correctly-
    // rounded ops on exact ints.
    //
    // Scale shape: one day-grain agg; the centered window over the
    // calendar-bounded series (classical_decomposition's whitelisted
    // shape); a ≤7-row dow agg ends the corpus work.
    "seasonal_strength" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
        val dev = daily
          .withColumn("sum7", sum(col("c")).over(w7))
          .withColumn("cnt7", count(lit(1)).over(w7))
          .filter(col("cnt7") === 7)
          .select(weekday(col("d")).cast("long").as("dow"),
            (col("c") * 7 - col("sum7")).as("d7"))
        val g = dev.groupBy("dow")
          .agg(count(lit(1)).as("ng"), sum(col("d7")).as("tg"),
            sum(col("d7") * col("d7")).as("sg"))
        g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
            sum(col("tg")).as("t"), sum(col("sg")).as("ss"),
            sort_array(collect_list(struct(col("dow"), col("tg"), col("ng"))))
              .as("terms"))
          .withColumn("q", expr(
            "aggregate(terms, cast(0.0 as double), (acc, x) -> acc + (cast(x.tg as double) * cast(x.tg as double)) / cast(x.ng as double))"))
          .select(col("k"), col("n"),
            (col("q") - (col("t").cast("double") * col("t").cast("double"))
              / col("n").cast("double")).as("ss_dow"),
            (col("ss").cast("double") - col("q")).as("ss_resid"))
          .select(col("k"), col("n"), col("ss_dow"), col("ss_resid"),
            when(col("ss_dow") + col("ss_resid") === 0.0, lit(null).cast("double"))
              .otherwise(col("ss_dow") / (col("ss_dow") + col("ss_resid")))
              .as("eta_sq"),
            when(col("k") <= 1 || col("n") <= col("k"), lit(null).cast("double"))
              .otherwise((col("ss_dow") / (col("k") - 1).cast("double"))
                / (col("ss_resid") / (col("n") - col("k")).cast("double")))
              .as("f_stat"))
      },
      oracle = Some(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY CAST(ts AS DATE)),
          |ma AS (SELECT d, c,
          |         SUM(c) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
          |         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
          |       FROM daily),
          |dev AS (SELECT CAST(isodow(d) - 1 AS BIGINT) AS dow, c * 7 - sum7 AS d7
          |        FROM ma WHERE cnt7 = 7),
          |g AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS ng,
          |             CAST(SUM(d7) AS BIGINT) AS tg,
          |             CAST(SUM(d7 * d7) AS BIGINT) AS sg
          |      FROM dev GROUP BY dow),
          |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
          |             CAST(SUM(tg) AS BIGINT) AS t, CAST(SUM(sg) AS BIGINT) AS ss,
          |             list_reduce(
          |               list_prepend(CAST(0.0 AS DOUBLE),
          |                 list(CAST(tg AS DOUBLE) * CAST(tg AS DOUBLE) / ng ORDER BY dow)),
          |               (acc, x) -> acc + x) AS q
          |      FROM g),
          |m AS (SELECT k, n,
          |             q - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) AS ss_dow,
          |             CAST(ss AS DOUBLE) - q AS ss_resid
          |      FROM a)
          |SELECT k, n, ss_dow, ss_resid,
          |       CASE WHEN ss_dow + ss_resid = 0.0 THEN NULL
          |            ELSE ss_dow / (ss_dow + ss_resid) END AS eta_sq,
          |       CASE WHEN k <= 1 OR n <= k THEN NULL
          |            ELSE (ss_dow / CAST(k - 1 AS DOUBLE))
          |                 / (ss_resid / CAST(n - k AS DOUBLE)) END AS f_stat
          |FROM m""".stripMargin)),

    // ---- discrete-time churn hazard by tenure week (added r10) -------------
    // The life-table beside survival_km's day-grain KM and
    // lifecycle_states' calendar accounting: for each TENURE week k
    // (weeks from a user's first to last active week), the hazard of that
    // span ENDING at k — d(k) = users whose last active week is first+7k
    // and whose inactivity is proven (last < corpus max week, the
    // lifecycle right-censoring cut), risk(k) = users with span ≥ k.
    // hazard is ONE bare division; censored counts reported honestly per
    // tenure. The retention curve a growth model fits is 1−hazard
    // composed over k.
    //
    // Scale shape: one (user, week) distinct agg → per-user first/last
    // agg (ONE user exchange) → ≤ calendar-weeks tenure roll-up with a
    // cumulative risk window over the ≤weeks grid.
    "churn_hazard_by_tenure" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val uw = Tables.load(s, dir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val maxW = uw.agg(max(col("wk")).as("max_wk"))
        val spans = uw.groupBy("user_id")
          .agg(min(col("wk")).as("first_wk"), max(col("wk")).as("last_wk"))
          .crossJoin(broadcast(maxW))
          .select(
            expr("datediff(last_wk, first_wk) div 7").cast("long").as("k"),
            when(col("last_wk") < col("max_wk"), 1L).otherwise(0L).as("ended"))
        val byK = spans.groupBy("k")
          .agg(count(lit(1)).as("n_spans"), sum(col("ended")).as("churned"),
            sum(lit(1L) - col("ended")).as("censored"))
        val wDesc = Window.orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byK.withColumn("at_risk", sum(col("n_spans")).over(wDesc))
          .select(col("k"), col("at_risk"), col("churned"), col("censored"),
            (col("churned").cast("double") / col("at_risk").cast("double"))
              .as("hazard"))
          .orderBy("k")
      },
      oracle = Some(
        """WITH uw AS (SELECT DISTINCT user_id,
          |                   CAST(date_trunc('week', ts) AS DATE) AS wk
          |            FROM events),
          |mx AS (SELECT MAX(wk) AS max_wk FROM uw),
          |sp AS (SELECT CAST(datediff('day', MIN(wk), MAX(wk)) // 7 AS BIGINT) AS k,
          |              CASE WHEN MAX(wk) < (SELECT max_wk FROM mx) THEN 1 ELSE 0 END AS ended
          |       FROM uw GROUP BY user_id),
          |byk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_spans,
          |               CAST(SUM(ended) AS BIGINT) AS churned,
          |               CAST(SUM(1 - ended) AS BIGINT) AS censored
          |        FROM sp GROUP BY k),
          |r AS (SELECT *, CAST(SUM(n_spans) OVER (ORDER BY k DESC) AS BIGINT) AS at_risk
          |      FROM byk)
          |SELECT k, at_risk, churned, censored,
          |       CAST(churned AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
          |FROM r ORDER BY k""".stripMargin)),

    // ---- DAU stickiness: day-over-day returning users (added r10) ----------
    // The day-grain loyalty pulse beside rolling_active_users' DAU/WAU:
    // per day, how many of today's actives were ALSO active yesterday —
    // returning count, day-over-day retention (returning/prev_dau), and
    // the Jaccard of the two active sets. A product with rising DAU but
    // falling stickiness is buying traffic, not keeping it. Exact counts;
    // each ratio is ONE bare division.
    //
    // Scale shape: one (user, day) distinct agg → a self-join keyed
    // (user_id, day = day+1) — co-partitioned equi-join, never a set
    // intersection per day — then a ≤calendar-days roll-up joined to the
    // per-day DAU frame.
    "dau_stickiness" -> Q(
      fn = (s, dir) => {
        val ud = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
        val ret = ud.as("t").join(ud.as("y"),
            col("t.user_id") === col("y.user_id")
              && col("t.d") === date_add(col("y.d"), 1))
          .groupBy(col("t.d").as("d")).agg(count(lit(1)).as("n_returning"))
        dau.as("a").join(dau.as("b"), col("a.d") === date_add(col("b.d"), 1))
          .select(col("a.d").as("d"), col("a.dau").as("dau"),
            col("b.dau").as("prev_dau"))
          .join(ret, Seq("d"), "left")
          .select(col("d"), col("dau"), col("prev_dau"),
            coalesce(col("n_returning"), lit(0L)).as("n_returning"))
          .select(col("d"), col("dau"), col("prev_dau"), col("n_returning"),
            (col("n_returning").cast("double") / col("prev_dau").cast("double"))
              .as("dod_retention"),
            (col("n_returning").cast("double")
              / (col("dau") + col("prev_dau") - col("n_returning")).cast("double"))
              .as("active_jaccard"))
          .orderBy("d")
      },
      oracle = Some(
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
          |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
          |ret AS (SELECT t.d, CAST(COUNT(*) AS BIGINT) AS n_returning
          |        FROM ud t JOIN ud y
          |          ON t.user_id = y.user_id AND t.d = y.d + INTERVAL 1 DAY
          |        GROUP BY t.d),
          |m AS (SELECT a.d, a.dau, b.dau AS prev_dau,
          |             COALESCE(n_returning, 0) AS n_returning
          |      FROM dau a JOIN dau b ON a.d = b.d + INTERVAL 1 DAY
          |      LEFT JOIN ret ON ret.d = a.d)
          |SELECT d, dau, prev_dau, n_returning,
          |       CAST(n_returning AS DOUBLE) / CAST(prev_dau AS DOUBLE) AS dod_retention,
          |       CAST(n_returning AS DOUBLE)
          |         / CAST(dau + prev_dau - n_returning AS DOUBLE) AS active_jaccard
          |FROM m ORDER BY d""".stripMargin)),

    // ---- RFM tercile segmentation (added r10) ------------------------------
    // The classic CRM segmentation: every payer coded by Recency (days
    // since last purchase), Frequency (purchase count), Monetary (exact
    // cents) terciles — 27 possible segments, reported with user count and
    // revenue share. Tercile cutoffs are EXACT nearest-rank order
    // statistics computed on each dimension's value grid with cumulative
    // counts (the trimmed_mean_value machinery, never a corpus sort):
    // cutoff_k = min value whose cumulative count ≥ ⌈k·n/3⌉. Code 0 =
    // lowest tercile by VALUE on every axis (so r_code 0 = most recent,
    // f_code 0 = least frequent — the sign convention is documented, a
    // dashboard relabels). Revenue share is ONE bare division.
    //
    // Scale shape: one user-grain agg (purchases only); three value-grid
    // aggs with cumulative windows — each grid is value-domain bounded
    // (recency ≤ calendar days; frequency/monetary by the ingest domain,
    // the gini_user_revenue bucket argument) and R2-whitelisted with a
    // measured bound; cutoffs broadcast back as one 1-row frame; final
    // ≤27-row roll-up.
    "rfm_segments" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
        val maxD = ev.agg(max(to_date(col("ts"))).as("maxd"))
        val u = ev.groupBy("user_id")
          .agg(max(to_date(col("ts"))).as("lastd"),
            count(lit(1)).as("f"),
            (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("m"))
          .crossJoin(broadcast(maxD))
          .select(col("user_id"),
            datediff(col("maxd"), col("lastd")).cast("long").as("r"),
            col("f"), col("m"))
        def cutoffs(dim: String): org.apache.spark.sql.DataFrame = {
          val grid = u.groupBy(col(dim).as("v")).agg(count(lit(1)).as("c"))
          val wc = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val n = u.agg(count(lit(1)).as("n"))
          grid.withColumn("cum", sum(col("c")).over(wc))
            .crossJoin(broadcast(n))
            .agg(
              min(when(col("cum") >= expr("(n + 2) div 3"), col("v"))).as(s"${dim}1"),
              min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("v"))).as(s"${dim}2"))
        }
        val cuts = broadcast(cutoffs("r").crossJoin(cutoffs("f")).crossJoin(cutoffs("m")))
        u.crossJoin(cuts)
          .select(col("user_id"), col("m"),
            when(col("r") <= col("r1"), 0L).when(col("r") <= col("r2"), 1L).otherwise(2L).as("r_code"),
            when(col("f") <= col("f1"), 0L).when(col("f") <= col("f2"), 1L).otherwise(2L).as("f_code"),
            when(col("m") <= col("m1"), 0L).when(col("m") <= col("m2"), 1L).otherwise(2L).as("m_code"))
          .groupBy("r_code", "f_code", "m_code")
          .agg(count(lit(1)).as("n_users"), sum(col("m")).as("cents"))
          .orderBy("r_code", "f_code", "m_code")
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d,
          |                   CAST(value AS DECIMAL(18,2)) AS v
          |            FROM events WHERE event_type = 'purchase'),
          |mx AS (SELECT MAX(d) AS maxd FROM ev),
          |u AS (SELECT user_id,
          |             CAST(datediff('day', MAX(d), (SELECT maxd FROM mx)) AS BIGINT) AS r,
          |             CAST(COUNT(*) AS BIGINT) AS f,
          |             CAST(SUM(v) * 100 AS BIGINT) AS m
          |      FROM ev GROUP BY user_id),
          |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
          |rc AS (SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS r1,
          |              MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS r2
          |       FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
          |               SELECT r AS v, COUNT(*) AS c FROM u GROUP BY r) g) q, n),
          |fc AS (SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS f1,
          |              MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS f2
          |       FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
          |               SELECT f AS v, COUNT(*) AS c FROM u GROUP BY f) g) q, n),
          |mc AS (SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS m1,
          |              MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS m2
          |       FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM (
          |               SELECT m AS v, COUNT(*) AS c FROM u GROUP BY m) g) q, n),
          |coded AS (
          |  SELECT user_id, m,
          |         CASE WHEN r <= r1 THEN 0 WHEN r <= r2 THEN 1 ELSE 2 END AS r_code,
          |         CASE WHEN f <= f1 THEN 0 WHEN f <= f2 THEN 1 ELSE 2 END AS f_code,
          |         CASE WHEN m <= m1 THEN 0 WHEN m <= m2 THEN 1 ELSE 2 END AS m_code
          |  FROM u, rc, fc, mc)
          |SELECT CAST(r_code AS BIGINT) AS r_code, CAST(f_code AS BIGINT) AS f_code,
          |       CAST(m_code AS BIGINT) AS m_code,
          |       CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(m) AS BIGINT) AS cents
          |FROM coded GROUP BY r_code, f_code, m_code
          |ORDER BY r_code, f_code, m_code""".stripMargin)),

    // ---- inter-event gap profile (added r10) -------------------------------
    // The traffic-shape primitive beneath sessionization: per event type,
    // the distribution of within-user gaps to the PREVIOUS event (any
    // type — the gap is attributed to the arriving event), log₁₀-bucketed
    // by digit count of the gap in microseconds (an exact integer
    // "order of magnitude" — length of the decimal spelling, identical on
    // both engines). The 30-minute session gap, debounce windows, and
    // duplicate-burst heuristics are all read directly off this table.
    //
    // Scale shape: ONE user_id window exchange (session_paths' own
    // partitioning) → (type, digits) hash agg with map-side combine —
    // ≤ |types|·20 output rows.
    "inter_event_gap_profile" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .withColumn("digits", length(col("gap").cast("string")).cast("long"))
          .groupBy("event_type", "digits")
          .agg(count(lit(1)).as("n"), min(col("gap")).as("min_gap_us"),
            max(col("gap")).as("max_gap_us"))
          .orderBy("event_type", "digits")
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT event_type,
          |         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
          |           PARTITION BY user_id ORDER BY ts, event_id) AS gap
          |  FROM events),
          |d AS (SELECT event_type, gap,
          |             CAST(length(CAST(gap AS VARCHAR)) AS BIGINT) AS digits
          |      FROM g WHERE gap IS NOT NULL)
          |SELECT event_type, digits, CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
          |       CAST(MAX(gap) AS BIGINT) AS max_gap_us
          |FROM d GROUP BY event_type, digits ORDER BY event_type, digits""".stripMargin)),

    // ---- CUPED variance reduction audit (added r11) ----------------------
    // The experimentation-platform staple (Deng et al. 2013): before
    // trusting an A/B readout on user spend, how much metric variance
    // would the pre-period covariate remove? Users' spend cents are split
    // at the calendar midpoint into pre (x) and post (y);
    // θ = cov(x,y)/var(x) is the CUPED coefficient and ρ² = cov²/(vx·vy)
    // is exactly the variance fraction the adjustment removes. All sums
    // are exact integer cents in DECIMAL(38,0)/HUGEINT (Σx·y wraps int64
    // at ~10⁶ users of ~$100k spend); the n-scaled cross moments
    // cov_n = n·Sxy − Sx·Sy etc. stay exact decimals; θ is ONE bare
    // decimal→double division and ρ² one fixed IEEE chain over the
    // decimal→double casts. Zero-variance guards return NULL.
    //
    // Scale shape: 1-row calendar-bounds broadcast → ONE user-grain hash
    // agg (map-side combine) → 1-row moment roll-up; never a user sort.
    "cuped_adjustment" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"),
            floor(col("value") * 100).cast("long").as("cents"))
        val bounds = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val users = ev.crossJoin(broadcast(bounds))
          // div, not /: Spark int division via / yields DOUBLE and its
          // int cast TRUNCATES while DuckDB's ROUNDS — floor-div on both
          .withColumn("mid",
            expr("date_add(d0, CAST((datediff(d1, d0) + 1) div 2 AS INT))"))
          .groupBy("user_id")
          .agg(
            sum(when(col("d") < col("mid"), col("cents")).otherwise(0L)).as("x"),
            sum(when(col("d") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
        users
          .agg(count(lit(1)).as("n"),
            sum(big(col("x"))).as("sx"), sum(big(col("y"))).as("sy"),
            sum(big(col("x")) * big(col("y"))).as("sxy"),
            sum(big(col("x")) * big(col("x"))).as("sxx"),
            sum(big(col("y")) * big(col("y"))).as("syy"))
          .withColumn("covn", big(col("n")) * col("sxy") - col("sx") * col("sy"))
          .withColumn("vxn", big(col("n")) * col("sxx") - col("sx") * col("sx"))
          .withColumn("vyn", big(col("n")) * col("syy") - col("sy") * col("sy"))
          .select(col("n").as("n_users"),
            when(col("vxn") === 0, lit(null).cast("double"))
              .otherwise(col("covn").cast("double") / col("vxn").cast("double"))
              .as("theta"),
            when(col("vxn") === 0 || col("vyn") === 0, lit(null).cast("double"))
              .otherwise(col("covn").cast("double") * col("covn").cast("double")
                / (col("vxn").cast("double") * col("vyn").cast("double")))
              .as("rho2"))
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d,
          |                   CAST(FLOOR(value * 100) AS BIGINT) AS cents
          |            FROM events),
          |b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ev),
          |u AS (SELECT user_id,
          |             CAST(SUM(CASE WHEN d < d0 + CAST((date_diff('day', d0, d1) + 1) // 2 AS INT)
          |                           THEN cents ELSE 0 END) AS BIGINT) AS x,
          |             CAST(SUM(CASE WHEN d >= d0 + CAST((date_diff('day', d0, d1) + 1) // 2 AS INT)
          |                           THEN cents ELSE 0 END) AS BIGINT) AS y
          |      FROM ev CROSS JOIN b GROUP BY user_id),
          |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
          |             SUM(CAST(x AS HUGEINT) * y) AS sxy,
          |             SUM(CAST(x AS HUGEINT) * x) AS sxx,
          |             SUM(CAST(y AS HUGEINT) * y) AS syy
          |      FROM u),
          |c AS (SELECT n, n * sxy - sx * sy AS covn,
          |             n * sxx - sx * sx AS vxn,
          |             n * syy - sy * sy AS vyn
          |      FROM m)
          |SELECT n AS n_users,
          |       CASE WHEN vxn = 0 THEN NULL
          |            ELSE CAST(covn AS DOUBLE) / CAST(vxn AS DOUBLE) END AS theta,
          |       CASE WHEN vxn = 0 OR vyn = 0 THEN NULL
          |            ELSE CAST(covn AS DOUBLE) * CAST(covn AS DOUBLE)
          |                 / (CAST(vxn AS DOUBLE) * CAST(vyn AS DOUBLE)) END AS rho2
          |FROM c""".stripMargin)),

    // ---- deterministic HyperLogLog cardinality audit (added r11) ----------
    // The mergeable-sketch story every 100 TB pipeline leans on (Flajolet
    // 2007): per event type, a 64-register HLL estimate of distinct users
    // beside the exact count — the number that says whether the sketch a
    // dashboard/stream would use is trustworthy on THIS key distribution.
    // Unlike approx_count_distinct (whose registers are engine-internal),
    // every bit here is derived from md5 and reproduced by the DuckDB
    // oracle: register j = max over items of (leading-zero run of the
    // 60-bit md5 suffix) + 1, bucket = top 6 bits; duplicates are free
    // (max is idempotent — the property that makes the sketch mergeable
    // across partitions, streams, and days). The harmonic sum is EXACT:
    // Σ2^(62−M_j) as integers (never a float accumulation — 64 powers of
    // two don't fit a 53-bit mantissa, so float order would diverge);
    // the raw estimate α·m²·2⁶²/S and the small-range linear-counting
    // branch m·ln(m/V) (ln via [[LnGrid]]) are fixed IEEE chains.
    //
    // Scale shape: map-side hash/register derivation → (type, bucket ≤ 64)
    // agg with map-side combine → ≤|types| roll-up; the exact side is one
    // distinct-collapse agg (at 100 TB the exact leg is the expensive one
    // — the audit exists to decide when to STOP running it).
    "hll_distinct_audit" -> Q(
      fn = (s, dir) => {
        val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val ev = Tables.load(s, dir, "events")
          .withColumn("dg", md5(concat(lit("hll:"), col("user_id").cast("string"))))
          .withColumn("h8",
            expr("""(instr('0123456789abcdef', substring(dg, 1, 1)) - 1) * 16
                   | + instr('0123456789abcdef', substring(dg, 2, 1)) - 1""".stripMargin))
          .withColumn("bucket", expr("h8 div 4"))
          .withColumn("sfx", expr("substring(dg, 3, 15)"))
          .withColumn("zs", expr("length(regexp_extract(sfx, '^(0*)', 1))"))
          .withColumn("cv",
            expr("instr('0123456789abcdef', substring(sfx, zs + 1, 1)) - 1"))
          .withColumn("rho",
            expr("""CASE WHEN zs >= 15 THEN 61L
                   | ELSE CAST(zs AS BIGINT) * 4L
                   |   + (CASE WHEN cv >= 8 THEN 0L WHEN cv >= 4 THEN 1L
                   |           WHEN cv >= 2 THEN 2L ELSE 3L END) + 1L END""".stripMargin))
        val reg = ev.groupBy(col("event_type"), col("bucket"))
          .agg(max(col("rho")).as("m"))
        val agg = reg.groupBy("event_type")
          .agg(count(lit(1)).as("nb"),
            // decimal sum: 64 registers at m = 1 total 2^67 > int64
            sum(expr("cast(shiftleft(1L, cast(62 - m as int)) as decimal(38,0))"))
              .as("sp"))
          .withColumn("v_zero", lit(64L) - col("nb"))
          .withColumn("s62",
            big(col("sp")) + big(col("v_zero")) * big(lit(4611686018427387904L)))
          .withColumn("hll_raw",
            (lit(0.709) * lit(4096.0) * lit(4611686018427387904.0))
              / col("s62").cast("double"))
        val est = LnGrid
          .withLn6(agg, lit(64L), greatest(col("v_zero"), lit(1L)), "l6", "__hll_")
          .withColumn("hll_est",
            when(col("hll_raw") <= 160.0 && col("v_zero") > 0,
              (lit(64.0) * col("l6").cast("double")) / lit(1000000.0))
              .otherwise(col("hll_raw")))
        val exact = Tables.load(s, dir, "events").groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        exact.join(est, Seq("event_type"))
          .select(col("event_type"), col("n_exact"),
            col("nb").as("n_buckets_used"), col("v_zero"),
            col("hll_raw"), col("hll_est"),
            ((col("hll_est") - col("n_exact").cast("double"))
              / col("n_exact").cast("double")).as("rel_err"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""WITH dgt AS (SELECT event_type,
           |              md5('hll:' || CAST(user_id AS VARCHAR)) AS dg
           |            FROM events),
           |hx AS (SELECT event_type,
           |          ((instr('0123456789abcdef', substring(dg, 1, 1)) - 1) * 16
           |            + instr('0123456789abcdef', substring(dg, 2, 1)) - 1) // 4 AS bucket,
           |          substring(dg, 3, 15) AS sfx
           |       FROM dgt),
           |rr AS (SELECT event_type, bucket,
           |          length(regexp_extract(sfx, '^(0*)', 1)) AS zs,
           |          instr('0123456789abcdef',
           |            substring(sfx, CAST(length(regexp_extract(sfx, '^(0*)', 1)) + 1 AS INT), 1))
           |            - 1 AS cv
           |       FROM hx),
           |rho AS (SELECT event_type, bucket,
           |          CASE WHEN zs >= 15 THEN 61
           |               ELSE zs * 4 + (CASE WHEN cv >= 8 THEN 0 WHEN cv >= 4 THEN 1
           |                                   WHEN cv >= 2 THEN 2 ELSE 3 END) + 1 END AS rho
           |        FROM rr),
           |reg AS (SELECT event_type, bucket, CAST(MAX(rho) AS BIGINT) AS m
           |        FROM rho GROUP BY 1, 2),
           |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb,
           |          CAST(SUM(CAST(1 AS BIGINT) << CAST(62 - m AS INT)) AS HUGEINT) AS sp
           |        FROM reg GROUP BY 1),
           |ag2 AS (SELECT *, 64 - nb AS v_zero,
           |          sp + CAST(64 - nb AS HUGEINT) * 4611686018427387904 AS s62,
           |          CAST(GREATEST(64 - nb, 1) AS BIGINT) AS vt
           |        FROM agg),
           |raw AS (SELECT *,
           |          ((0.709 * 4096.0) * 4611686018427387904.0) / CAST(s62 AS DOUBLE) AS hll_raw
           |        FROM ag2),
           |${LnGrid.sqlCtes("raw", "64", "vt", "l6", "hll_")},
           |est AS (SELECT *, CASE WHEN hll_raw <= 160.0 AND v_zero > 0
           |                       THEN (64.0 * CAST(l6 AS DOUBLE)) / 1000000.0
           |                       ELSE hll_raw END AS hll_est
           |        FROM hll_out),
           |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
           |       FROM events GROUP BY 1)
           |SELECT ex.event_type, n_exact, nb AS n_buckets_used,
           |       CAST(v_zero AS BIGINT) AS v_zero, hll_raw, hll_est,
           |       (hll_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
           |FROM ex JOIN est ON ex.event_type = est.event_type
           |ORDER BY ex.event_type""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the event-grid operators — the DuckDB oracle pins
  * exact values at the gate; these pin the invariants that survive any
  * corpus: grid completeness, carry-forward causality, and conservation.
  */
class FunnelQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("resample_locf: complete grid, causal LOCF, purchase conservation") {
    val out = graft.SparkEntry.queries("resample_locf")(spark, dir)
      .select("user_id", "day", "n_purchases", "locf_value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))

    // grid completeness: every user carries every day of the corpus span
    val days = out.map(_._2).distinct.sorted
    val span = days.head.datesUntil(days.last.plusDays(1)).count()
    assert(days.size.toLong == span, s"grid has holes: ${days.size} of $span days")
    val users = out.map(_._1).distinct
    assert(out.length == users.length * days.size,
      s"${out.length} rows != ${users.length} users x ${days.size} days")

    // conservation: grid purchase counts sum to the raw purchase count
    val rawPurchases = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_._3).sum == rawPurchases)

    // causal LOCF per user: null until the first purchase day, then always
    // the most recent day-end value — recomputed here by a left fold over
    // the day-sorted rows using an independently derived day-end map
    val dayEnd = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max_by(col("value"), col("event_id")).as("v")).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getDouble(2))).toMap
    out.groupBy(_._1).foreach { case (u, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(_._2.toEpochDay).foreach { case (_, day, _, locf) =>
        carry = dayEnd.get((u, day)).orElse(carry)
        assert(locf == carry, s"user $u day $day: locf $locf != expected $carry")
      }
    }
  }

  test("transition_matrix: rows are a proper conditional distribution; transition count conserved") {
    val rows = graft.SparkEntry.queries("transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // per cur-state: probs sum to 1 (counts are exact; one division each)
    rows.groupBy(_._1).foreach { case (cur, rs) =>
      val p = rs.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$cur row sums to $p")
      rs.foreach { case (_, nxt, c, prob) =>
        assert(prob > 0 && prob <= 1.0, s"$cur->$nxt prob $prob")
        assert(c > 0)
      }
    }
    // every user contributes exactly (events - 1) transitions
    val ev = graft.Tables.load(spark, dir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      s"transition mass ${rows.map(_._3).sum} != $nEvents - $nUsers")
  }

  test("user_activity_profile: conservation and burstiness bounds") {
    val rows = graft.SparkEntry.queries("user_activity_profile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.load(spark, dir, "events").count()
    assert(rows.map(_._2).sum == nEvents, "per-user event counts must conserve the corpus")
    rows.foreach { case (u, n, days, maxd, mean, burst) =>
      assert(days >= 1 && days <= n, s"user $u days=$days n=$n")
      assert(maxd >= 1 && maxd <= n, s"user $u maxd=$maxd")
      assert(math.abs(mean - n.toDouble / days) < 1e-12, s"user $u mean_day $mean")
      // burstiness = max/mean: 1 exactly when activity is even, <= days always
      assert(burst >= 1.0 - 1e-12 && burst <= days.toDouble + 1e-12,
        s"user $u burstiness $burst outside [1, days=$days]")
    }
  }

  test("session_paths: mass equals session count; paths bounded at 3 hops") {
    val rows = graft.SparkEntry.queries("session_paths")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (path, n) =>
      assert(n > 0)
      val hops = path.split(">")
      assert(hops.length >= 1 && hops.length <= 3, s"path '$path' has ${hops.length} hops")
      assert(hops.forall(_.nonEmpty), s"empty hop in '$path'")
    }
    // one path per session: total mass = number of 30-min-gap sessions,
    // recomputed via the oracle-checked session-window query
    val nSessions = graft.SparkEntry.queries("q_session_window")(spark, dir).count()
    assert(rows.map(_._2).sum == nSessions,
      s"path mass ${rows.map(_._2).sum} != $nSessions sessions")
  }

  test("daily_anomalies: exact flag agrees with the float z at the 3-sigma rule") {
    val rows = graft.SparkEntry.queries("daily_anomalies")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.load(spark, dir, "events").count()
    assert(rows.map(_._3).sum == nEvents, "daily counts must conserve the corpus")
    rows.foreach { case (t, d, _, z, flag) =>
      // the flag is decided in exact integers; z is its float shadow -
      // they must agree away from the knife edge
      if (flag == 1) assert(z > 3.0 - 1e-9, s"$t $d flagged but z=$z")
      else assert(z < 3.0 + 1e-9, s"$t $d unflagged but z=$z")
    }
    // per type, z-scores sum to ~0 (sum of n*c - S over days is exactly 0)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val s = rs.map(_._4).sum
      assert(math.abs(s) < 1e-6, s"$t z-scores sum to $s")
    }
  }

  test("gap_quantiles: quantiles monotone, gap mass = events minus one per type") {
    val rows = graft.SparkEntry.queries("gap_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val typeCounts = graft.Tables.load(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, n, p50, p90, p99) =>
      assert(n == typeCounts(t) - 1, s"$t gaps $n != ${typeCounts(t)} - 1 events")
      assert(p50 >= 0 && p50 <= p90 && p90 <= p99, s"$t quantiles not monotone: $p50 $p90 $p99")
    }
  }

  test("gap_quantiles: the documented approx_percentile drop-in brackets the exact values") {
    // the scaladoc claims approx_percentile is the production substitute -
    // prove the claim: at accuracy 10000 the sketch's rank error is <= n/10000,
    // so on sf0.001's per-type gap counts (~200) it must return a value
    // between the exact neighbors of each requested quantile; we assert the
    // weaker, stable property that approx lands within the exact [p50, p99]
    // envelope and within 5% relative of each exact quantile
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val approx = graft.Tables.load(spark, dir, "events")
      .withColumn("gap",
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).cast("double"))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(expr("approx_percentile(gap, array(0.5, 0.9, 0.99), 10000)").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // rank-bracketing is the sketch's actual contract (value-relative
    // tolerances are meaningless in a long tail): the returned sample's
    // rank must sit within the sketch rank error (+1 for the exact side's
    // interpolation between neighbors) of the target rank p*(n-1)
    val gapsByType = graft.Tables.load(spark, dir, "events")
      .withColumn("gap",
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).cast("double"))
      .filter(col("gap").isNotNull)
      .select("event_type", "gap").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(approx.keySet == gapsByType.keySet)
    approx.foreach { case (t, qs) =>
      val sorted = gapsByType(t)
      val n = sorted.length
      val rankErr = 1.0 + n.toDouble / 10000.0
      qs.zip(Seq(0.5, 0.9, 0.99)).foreach { case (a, p) =>
        val lo = sorted.count(_ < a) // the value's rank envelope in the sample
        val hi = sorted.count(_ <= a) - 1
        val target = p * (n - 1)
        assert(lo - rankErr <= target && target <= hi + rankErr,
          s"$t p$p: approx $a has rank [$lo,$hi], target $target, err $rankErr")
      }
    }
  }

  test("bootstrap_mean_ci: CI brackets the mean and shrinks ~1/sqrt(n) with corpus growth") {
    def ci(sfDir: String) = graft.SparkEntry.queries("bootstrap_mean_ci")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val small = ci("/root/testdata/sf0.001")
    val big = ci("/root/testdata/sf0.01")
    assert(small.nonEmpty && small.keySet == big.keySet)
    for ((t, (n, mean, lo, hi)) <- small ++ big) {
      assert(lo < hi, s"$t: degenerate CI [$lo, $hi]")
      assert(lo <= mean && mean <= hi, s"$t: mean $mean outside CI [$lo, $hi] (n=$n)")
    }
    // 10× the data → the interval tightens (≈√10×; assert a loose 1.5×
    // so resampling noise over 32 replicas can't flake the suite)
    for (t <- small.keySet) {
      val ws = small(t)._4 - small(t)._3
      val wb = big(t)._4 - big(t)._3
      assert(wb < ws / 1.5, s"$t: CI width did not shrink: sf0.001=$ws sf0.01=$wb")
    }
  }

  test("conversion_latency: counts the same converting users as funnel_steps; quantiles ordered") {
    val lat = graft.SparkEntry.queries("conversion_latency")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val funnel = graft.SparkEntry.queries("funnel_steps")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lat.keySet == Set("1_click_to_signup", "2_signup_to_purchase"))
    // a converting user IS a user at the next funnel step — same construction
    assert(lat("1_click_to_signup")._1 == funnel("2_signup"))
    assert(lat("2_signup_to_purchase")._1 == funnel("3_purchase"))
    lat.foreach { case (step, (n, p50, p90)) =>
      assert(n > 0, s"$step: no converters at all")
      assert(p50 > 0 && p50 <= p90, s"$step: quantiles disordered: p50=$p50 p90=$p90")
    }
  }

  test("mad_anomalies: median/MAD recomputed in-process; flag arithmetic exact") {
    val rows = graft.SparkEntry.queries("mad_anomalies")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val counts = rs.map(_._2).sorted
      val n = counts.length
      val med = (counts((n - 1) / 2) + counts(n / 2)) / 2.0
      assert(rs.head._3 == med, s"$tpe median ${rs.head._3} != $med")
      val devs = counts.map(c => math.abs(2 * c - 2 * med)).map(_.toLong).sorted
      val mad = (devs((n - 1) / 2) + devs(n / 2)) / 4.0
      assert(rs.head._4 == mad, s"$tpe MAD ${rs.head._4} != $mad")
      rs.foreach { case (_, c, _, _, flag) =>
        val expect = math.abs(2 * c - 2 * med).toLong * 20000 > (4 * mad).toLong * 44478
        assert(flag == expect, s"$tpe day count $c flag $flag != $expect")
      }
    }
  }

  test("debounce_events: kept + dropped conserve; agrees with an in-process replay") {
    val rows = graft.SparkEntry.queries("debounce_events")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val perType = graft.Tables.load(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, total, kept, dropped) =>
      assert(total == perType(t), s"$t total mismatch")
      assert(kept + dropped == total, s"$t kept+dropped != total")
      assert(kept >= 1, s"$t first event per (user, type) is always kept")
    }
    // replay the gap rule in-process
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val kept2 = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      sorted.zip(None +: sorted.init.map(e => Some(e._3))).map {
        case (e, prev) => (e._2, prev.forall(p => e._3 - p > 300000000L))
      }
    }.groupBy(_._1).map { case (t, xs) => t -> xs.count(_._2).toLong }
    rows.foreach { case (t, _, kept, _) =>
      assert(kept == kept2(t), s"$t kept $kept != replay ${kept2(t)}")
    }
  }

  test("attribution_lasttouch: attributed ⊆ purchases; replayed in-process") {
    val rows = graft.SparkEntry.queries("attribution_lasttouch")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, np, na) =>
      assert(na >= 0 && na <= np, s"$d attributed $na outside [0, $np]")
    }
    val totalPurch = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum == totalPurch, "per-day purchases must sum to the corpus total")
    // replay: last click strictly before each purchase, 7-day lookback
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val attributed = evs.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var lastClick = Long.MinValue
      var n = 0L
      sorted.foreach { e =>
        if (e._4 == "purchase" && lastClick != Long.MinValue && e._3 - lastClick <= 604800000000L) n += 1
        if (e._4 == "click") lastClick = e._3
      }
      n
    }.sum
    assert(rows.map(_._3).sum == attributed, "attribution replay diverged")
  }

  test("survival_km: risk set monotone, survival non-increasing in [0,1], replayed in-process") {
    val rows = graft.SparkEntry.queries("survival_km")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byT = rows.sortBy(_._1)
    byT.sliding(2).foreach {
      case Array((_, n1, _, s1), (_, n2, _, s2)) =>
        assert(n2 < n1, "risk set must strictly shrink across death days")
        assert(s2 <= s1, "survival must be non-increasing")
      case _ =>
    }
    byT.foreach { case (_, n, d, s) =>
      assert(d >= 1 && d <= n)
      assert(s >= 0.0 && s <= 1.0, s"survival $s outside [0,1]")
      // the integer-grid recurrence floors each step: S stays within the
      // exact real KM product and above it minus k steps of 1e-9 slack
    }
    // replay the estimator from per-user durations
    val obs = graft.Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(
        min(to_date(col("ts"))).as("d0"),
        min(when(col("event_type") === "purchase", to_date(col("ts")))).as("dd"),
        max(to_date(col("ts"))).as("dc"))
      .collect().map { r =>
        // column 0 is the user_id group key
        val d0 = r.getDate(1).toLocalDate
        val dd = Option(r.getDate(2)).map(_.toLocalDate)
        val dc = r.getDate(3).toLocalDate
        val end = dd.getOrElse(dc)
        (java.time.temporal.ChronoUnit.DAYS.between(d0, end).toInt, dd.isDefined)
      }
    byT.foreach { case (t, nRisk, nEvents, _) =>
      assert(nRisk == obs.count(_._1 >= t).toLong, s"t=$t risk-set mismatch")
      assert(nEvents == obs.count(o => o._1 == t && o._2).toLong, s"t=$t event-count mismatch")
    }
  }

  test("cusum_drift: recursion replayed in-process — CUSUM exact, EMA bit-identical") {
    val rows = graft.SparkEntry.queries("cusum_drift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val byDay = rs.sortBy(_._2)
      val n = byDay.length.toLong
      val sa = byDay.map(_._3).sum
      var s = 0L
      var e = 0.0
      byDay.zipWithIndex.foreach { case ((_, day, c, cusum, alarm, ema), i) =>
        s = math.max(0L, s + n * c - sa)
        e = if (i == 0) c.toDouble else (c.toDouble + e) / 2
        assert(cusum == s, s"$tpe $day CUSUM $cusum != $s")
        assert(alarm == (s > 3 * sa), s"$tpe $day alarm mismatch")
        assert(ema == e, s"$tpe $day EMA $ema != $e (must be bit-identical)")
      }
    }
  }

  test("basket_lift: ordered pairs, co-occurrence bounded by item counts, exact lift identity") {
    val rows = graft.SparkEntry.queries("basket_lift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // independent recount of baskets and item frequencies
    val b = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type")).distinct()
    val n = b.select("user_id", "d").distinct().count()
    val item = b.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (a, bb, cab, support, lift) =>
      assert(a < bb, s"pair ($a, $bb) not ordered")
      assert(cab >= 20, "support floor violated")
      assert(cab <= math.min(item(a), item(bb)), s"($a,$bb) c_ab $cab exceeds item counts")
      assert(support > 0 && support <= 1.0)
      // lift identity against the independent counts (exact: same op chain)
      val expect = (BigInt(cab) * BigInt(n)).toDouble / (BigInt(item(a)) * BigInt(item(bb))).toDouble
      assert(lift == expect, s"($a,$bb) lift $lift != $expect")
    }
  }

  test("event_seq_logprob: n_trans = events−1 per user; scores ≤ 0; model-consistent") {
    val rows = graft.SparkEntry.queries("event_seq_logprob")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val perUser = graft.Tables.load(spark, dir, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly the ≥2-event users, each with count−1 transitions
    assert(rows.map(_._1).toSet == perUser.filter(_._2 >= 2).keySet)
    rows.foreach { case (u, n, lp) =>
      assert(n == perUser(u) - 1, s"user $u transition count")
      assert(lp <= 0.0, s"user $u logprob $lp must be ≤ 0 (probs ≤ 1)")
    }
    // model consistency: the transition-count-weighted mean of the per-user
    // scores is the model's own cross-entropy −H(next|cur) computed from
    // the transition counts through the SAME LnGrid chain (ln6Ref is the
    // spec-pinned Scala mirror), so agreement is tight — both are exact
    // int sums of the same grid values
    val cnt = graft.queries.FunnelQueries.userTransitionCounts(
        graft.Tables.load(spark, dir, "events"))
      .groupBy("cur", "nxt").agg(org.apache.spark.sql.functions.sum("c").as("cpc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ctx = cnt.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val totalTrans = cnt.map(_._3).sum
    val modelMean = cnt.map { case (cur, _, c) =>
      c.toDouble * graft.queries.LnGrid.ln6Ref(c, ctx(cur)) }.sum /
      (totalTrans.toDouble * 1000000.0d)
    val userMean = rows.map { case (_, n, lp) => n * lp }.sum / rows.map(_._2).sum
    assert(math.abs(userMean - modelMean) < 1e-9,
      s"weighted user mean $userMean != model cross-entropy $modelMean")
  }
}

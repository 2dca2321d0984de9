package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the round-10 operator batch. The DuckDB oracle
  * pins exact values at the gate; these pin engine-independent invariants:
  * full in-process replays of the integer algebra where the operator is
  * replayable from collected rows, and independent same-engine
  * re-formulations (window argmin vs struct argmin, pairwise vs grid)
  * where the hashed surface rides float folds that a Scala replay could
  * not reproduce bit-exactly.
  */
class R10BatchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("kendall_tau_length_quality: grid computation == direct pairwise replay") {
    val out = graft.SparkEntry.queries("kendall_tau_length_quality")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val stop = TextQueries.stopwords.toSet
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars", "text").collect()
      .map { r =>
        val text = r.getString(2)
        val toks = text.split(" ", -1)
        val y = (math.floor((0.4 * math.min(1.0, toks.length.toDouble / 50.0) +
          0.3 * (1.0 - toks.count(stop).toDouble / toks.length) +
          0.3 * math.min(1.0, text.length.toDouble / 200.0)) * 1000000.0).toLong) / 100000L
        (r.getString(0), r.getLong(1), y)
      }
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val xs = rows.map(r => (r._2, r._3))
      var c = 0L; var d = 0L
      for (i <- xs.indices; j <- xs.indices if j > i) {
        val ((x1, y1), (x2, y2)) = (xs(i), xs(j))
        if (x1 != x2 && y1 != y2) {
          if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
        }
      }
      val n = xs.length.toLong
      val n0 = n * (n - 1) / 2
      val tx = xs.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      val ty = xs.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      // r11: denominator is √(n0−tx)·√(n0−ty) in IEEE double (no int64
      // product that could wrap; see the query's Scaladoc)
      val denom = math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)
      val expTau = if (denom == 0.0) None else Some((c - d).toDouble / denom)
      assert(out(src) == ((n, c, d, expTau)), s"$src kendall replay")
    }
  }

  test("page_hinkley_drift: full replay of the micro-grid PH recursion") {
    val out = graft.SparkEntry.queries("page_hinkley_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDate(4).toLocalDate))).toMap
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (t, rows) =>
      val series = rows.sortBy(_._2.toEpochDay)
      var s = 0L; var ph = 0L; var runmin = Long.MaxValue
      var maxExc = Long.MinValue; var nAlarm = 0L
      var firstAlarm: Option[java.time.LocalDate] = None
      series.zipWithIndex.foreach { case ((_, day, x), i) =>
        s += x
        val dev6 = x * 1000000L - (s * 1000000L) / (i + 1)
        ph += dev6
        runmin = math.min(runmin, ph)
        val exc = ph - runmin
        maxExc = math.max(maxExc, exc)
        if (exc > 50000000L) { nAlarm += 1; if (firstAlarm.isEmpty) firstAlarm = Some(day) }
      }
      assert(out(t) == ((series.size.toLong, maxExc, nAlarm, firstAlarm)), s"$t PH replay")
    }
  }

  test("rfm_segments: full replay of the nearest-rank tercile coding") {
    val out = graft.SparkEntry.queries("rfm_segments")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val maxD = ev.map(_._2.toEpochDay).max
    val u = ev.groupBy(_._1).map { case (uid, rs) =>
      (uid, maxD - rs.map(_._2.toEpochDay).max, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq
    def cuts(vs: Seq[Long]): (Long, Long) = {
      val sorted = vs.sorted
      val n = sorted.length.toLong
      // min value with cumulative count >= ceil(k·n/3) == that rank's value
      (sorted(((n + 2) / 3 - 1).toInt), sorted(((2 * n + 2) / 3 - 1).toInt))
    }
    val (r1, r2) = cuts(u.map(_._2))
    val (f1, f2) = cuts(u.map(_._3))
    val (m1, m2) = cuts(u.map(_._4))
    def code(v: Long, c1: Long, c2: Long) = if (v <= c1) 0L else if (v <= c2) 1L else 2L
    val expected = u.groupBy(x =>
        (code(x._2, r1, r2), code(x._3, f1, f2), code(x._4, m1, m2)))
      .map { case (k, rs) => k -> (rs.size.toLong, rs.map(_._4).sum) }
    assert(out == expected, "segment counts/revenue replay")
    assert(out.values.map(_._1).sum == u.size.toLong, "segments partition the payers")
  }

  test("inter_event_gap_profile: full replay of the digit-bucketed gaps") {
    val out = graft.SparkEntry.queries("inter_event_gap_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val evs = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = evs.groupBy(_._1).values.flatMap { rs =>
      val sorted = rs.sortBy(e => (e._4, e._2))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (b._3, b._4 - a._4) }
    }
    val expected = gaps.groupBy(g => (g._1, g._2.toString.length.toLong))
      .map { case (k, gs) =>
        k -> (gs.size.toLong, gs.map(_._2).min, gs.map(_._2).max) }
    assert(out == expected, "gap digit-profile replay")
  }

  test("k_anonymity_audit: full replay of the cell-size accounting") {
    val out = graft.SparkEntry.queries("k_anonymity_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val cells = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).map { case ((t, d), rs) => (t, d, rs.size.toLong) }
    val expected = cells.groupBy(_._1).map { case (t, cs) =>
      val ks = cs.map(_._3).toSeq
      t -> (ks.size.toLong, ks.sum, ks.min,
        ks.count(_ < 5).toLong, ks.filter(_ < 5).sum)
    }
    assert(out == expected, "k-anonymity cell replay")
  }

  test("reciprocal_nn_rate: struct-argmin NN == window-rank NN (independent formulation)") {
    // the hashed surface rides the floatL2Sq fold (not Scala-replayable
    // bit-exactly) — so re-derive the NN frame through a DIFFERENT engine
    // path (row_number window instead of min(struct)) and pin equality
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val lists = AnnQueries.ivfLists(emb)
    val a = lists.select(col("list_id"), col("cid").as("a_id"), col("cv").as("va"))
    val b = lists.select(col("list_id"), col("cid").as("b_id"), col("cv").as("vb"))
    val pairs = a.join(b, Seq("list_id")).filter(col("a_id") =!= col("b_id"))
      .withColumn("d2", graft.functions.VectorFunctions.floatL2Sq(col("va"), col("vb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id")).orderBy(col("d2"), col("b_id"))
    val nnWindow = pairs.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("a_id", "b_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recPairs = nnWindow.count { case (x, nx) =>
      nnWindow.get(nx).contains(x) && x < nx }
    val out = graft.SparkEntry.queries("reciprocal_nn_rate")(spark, dir).head()
    assert(out.getLong(0) == nnWindow.size.toLong, "n_vectors")
    assert(out.getLong(1) == recPairs.toLong, "reciprocal pairs vs window formulation")
    assert(out.getDouble(2) == 2.0 * recPairs / nnWindow.size, "rate division")
  }

  test("pq_code_usage: histogram identities + window-argmin cross-check") {
    val out = graft.SparkEntry.queries("pq_code_usage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val nEmb = graft.Tables.load(spark, dir, "embeddings").count()
    assert(out.keySet == (0L to 7L).toSet, "all 8 subspaces present")
    out.foreach { case (j, (n, used, topShare)) =>
      assert(n == nEmb, s"subspace $j must code every vector")
      assert(used >= 1 && used <= 16, s"subspace $j codes_used in [1,16]")
      assert(topShare >= 1.0 / 16 - 1e-12 && topShare <= 1.0, s"subspace $j share range")
    }
    // independent argmin formulation for one subspace: window rank = 1
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val sub = emb.select(col("vec_id"), expr("slice(embedding, 1, 8)").as("v"))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), expr("slice(embedding, 1, 8)").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d2"), col("cent_id"))
    val codes0 = sub.crossJoin(broadcast(cents))
      .withColumn("d2", graft.functions.VectorFunctions.floatL2Sq(col("v"), col("cv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy("cent_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedUsed0 = codes0.size.toLong
    val expectedTop0 = codes0.values.max.toDouble / nEmb
    assert(out(0L)._2 == expectedUsed0, "subspace 0 codes_used vs window argmin")
    assert(out(0L)._3 == expectedTop0, "subspace 0 top share vs window argmin")
  }

  test("coreset_kcenter: greedy monotonicity and coverage bound") {
    val rows = graft.SparkEntry.queries("coreset_kcenter")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "three rounds")
    assert(rows.map(_._2).distinct.length == 3, "picks distinct")
    assert(rows(0)._2 == 0L && rows(0)._3 == 0.0, "seed is vec 0")
    val radius = rows.head._4
    assert(rows.forall(_._4 == radius), "one radius repeated per row")
    // greedy: the max-min distance is non-increasing round over round,
    // and the final coverage radius cannot exceed the last pick's score
    assert(rows(1)._3 >= rows(2)._3, "greedy max-min non-increasing")
    assert(radius <= rows(2)._3 + 1e-6, "coverage radius bounded by last pick")
  }

  test("cliffs_delta_length: grid pair-counting == direct pairwise replay") {
    val out = graft.SparkEntry.queries("cliffs_delta_length")(spark, dir).head()
    val lens = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0).drop(3).toInt < 10, r.getLong(1)))
    val g1 = lens.filter(_._1).map(_._2)
    val g2 = lens.filterNot(_._1).map(_._2)
    var gt = 0L; var lt = 0L
    for (a <- g1; b <- g2) { if (a > b) gt += 1 else if (a < b) lt += 1 }
    assert(out.getLong(0) == g1.length.toLong && out.getLong(1) == g2.length.toLong)
    assert(out.getLong(2) == gt, "greater pairs")
    assert(out.getLong(3) == lt, "lesser pairs")
    assert(out.getDouble(4) == (gt - lt).toDouble / (g1.length.toLong * g2.length),
      "delta division")
  }

  test("isotonic_calibration: minimax replay + monotonicity + pooling identity") {
    val out = graft.SparkEntry.queries("isotonic_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // monotone by construction
    out.map(_._5).sliding(2).foreach(p =>
      if (p.size == 2) assert(p(0) <= p(1), "iso6 must be non-decreasing"))
    // replay the minimax on the collected (n, p) band frame
    val bands = out.map(x => (x._2, x._3))
    val cn = bands.scanLeft(0L)(_ + _._1).tail
    val cp = bands.scanLeft(0L)(_ + _._2).tail
    def rate6(j: Int, k: Int): Long = {
      val pp = cp(k) - (if (j == 0) 0L else cp(j - 1))
      val nn = cn(k) - (if (j == 0) 0L else cn(j - 1))
      pp * 1000000L / nn
    }
    out.indices.foreach { i =>
      val iso = (0 to i).map(j => (i until bands.length).map(k => rate6(j, k)).min).max
      assert(out(i)._5 == iso, s"band ${out(i)._1} minimax replay")
      assert(out(i)._4 == bands(i)._2 * 1000000L / bands(i)._1, s"band ${out(i)._1} raw rate")
    }
  }

  test("burrows_delta: full replay of the integer z-score algebra") {
    val out = graft.SparkEntry.queries("burrows_delta")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = graft.Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    val top = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(50).map(_._1)
    val srcN = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val counts = toks.filter(x => top.contains(x._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sources = srcN.keys.toSeq.sorted
    val f6 = (for (s <- sources; t <- top)
      yield (s, t) -> counts.getOrElse((s, t), 0L) * 1000000L / srcN(s)).toMap
    val z6 = top.flatMap { t =>
      val fs = sources.map(s => f6((s, t)))
      val ns = fs.length.toLong
      val sf = fs.sum; val sff = fs.map(x => x * x).sum
      val mean6 = sf / ns
      val var12 = (sff - sf * sf / ns) / ns
      val s0 = math.sqrt(var12.toDouble).toLong
      val sigma = if ((s0 + 1) * (s0 + 1) <= var12) s0 + 1
        else if (s0 * s0 > var12) s0 - 1 else s0
      sources.map(s => (s, t) ->
        (if (sigma == 0) 0L else (f6((s, t)) - mean6) * 1000000L / sigma))
    }.toMap
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield (a, b) -> top.map(t => math.abs(z6((a, t)) - z6((b, t)))).sum / 50L).toMap
    assert(out == expected, "per-pair delta6 replay")
  }

  test("seasonal_strength: variance decomposition identity vs classical_decomposition") {
    val out = graft.SparkEntry.queries("seasonal_strength")(spark, dir).head()
    // replay the deviations (the classical_decomposition algebra) and the
    // one-way decomposition SSB + SSW = SST
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val devs = daily.indices.collect {
      case i if i >= 3 && i + 3 < daily.size =>
        val sum7 = (i - 3 to i + 3).map(j => daily(j)._2).sum
        (daily(i)._1.getDayOfWeek.getValue.toLong - 1L, daily(i)._2 * 7 - sum7)
    }
    val n = devs.size.toLong
    val k = devs.map(_._1).distinct.size.toLong
    val t = devs.map(_._2).sum
    val ss = devs.map(x => x._2 * x._2).sum
    val q = devs.groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(0.0) { case (acc, (_, g)) =>
        val tg = g.map(_._2).sum
        acc + tg.toDouble * tg.toDouble / g.size }
    val ssDow = q - t.toDouble * t.toDouble / n
    val ssResid = ss.toDouble - q
    assert(out.getLong(0) == k && out.getLong(1) == n)
    assert(out.getDouble(2) == ssDow && out.getDouble(3) == ssResid, "SS replay")
    assert(out.getDouble(4) == ssDow / (ssDow + ssResid), "eta_sq")
    assert(out.getDouble(4) >= 0.0 - 1e-9 && out.getDouble(4) <= 1.0 + 1e-9)
  }

  test("churn_hazard_by_tenure: life-table replay + risk-set telescoping") {
    val out = graft.SparkEntry.queries("churn_hazard_by_tenure")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val uw = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val maxW = uw.map(_._2).max
    val spans = uw.groupBy(_._1).values.map { rs =>
      val ds = rs.map(_._2)
      ((ds.max - ds.min) / 7, ds.max < maxW)
    }.toSeq
    val expected = spans.groupBy(_._1).map { case (kk, g) =>
      kk -> (spans.count(_._1 >= kk).toLong,
        g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected, "life-table replay")
    // risk-set telescoping: risk(k) − (churned + censored at k) = risk(next k)
    out.sliding(2).foreach { p =>
      if (p.size == 2) {
        val ((_, (r1, c1, z1)), (_, (r2, _, _))) = (p(0), p(1))
        assert(r1 - c1 - z1 >= r2, "risk set must shrink by at least the k-exits")
      }
    }
  }

  test("token_position_drift: full replay of the head/tail TV distance") {
    val out = graft.SparkEntry.queries("token_position_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 100)
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val head = ds.flatMap(_._2.take(50))
      val tail0 = ds.flatMap(_._2.takeRight(50))
      val hc = head.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val tc = tail0.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nh = head.length.toLong; val nt = tail0.length.toLong
      val tv6 = (hc.keySet ++ tc.keySet).toSeq.map { t =>
        math.abs(hc.getOrElse(t, 0L) * 1000000L / nh - tc.getOrElse(t, 0L) * 1000000L / nt)
      }.sum / 2
      src -> (nh, nt, tv6)
    }
    assert(out == expected, "head/tail TV replay")
  }

  test("ab_srm_check: chi-squared replay and the unbiased-hash expectation") {
    val out = graft.SparkEntry.queries("ab_srm_check")(spark, dir).head()
    val splits = graft.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map { r =>
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:${r.getLong(0)}".getBytes("UTF-8"))
      val h2 = f"${dg(0) & 0xff}%02x"
      if (h2 < "cc") "train" else if (h2 < "e6") "val" else "test"
    }
    val n = splits.length.toLong
    val o = splits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def term(obs: Long, w: Long) = {
      val num = (obs * 256L - n * w).toDouble * (obs * 256L - n * w)
      num / (n * (256L * w)).toDouble
    }
    val chi2 = term(o.getOrElse("train", 0L), 204L) +
      term(o.getOrElse("val", 0L), 26L) + term(o.getOrElse("test", 0L), 26L)
    assert(out.getLong(0) == n)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((o.getOrElse("train", 0L), o.getOrElse("val", 0L), o.getOrElse("test", 0L))))
    assert(out.getDouble(4) == chi2, "chi2 replay")
    assert(!out.getBoolean(5), "a pure hash split must not trip SRM")
  }

  test("best_split_length_dup: exhaustive stump replay") {
    val out = graft.SparkEntry.queries("best_split_length_dup")(spark, dir).head()
    // labels via the independent md5 path (also re-proves the rolling swap)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val grams = docs.flatMap { case (id, _, text) =>
      val toks = text.split(" ", -1)
      if (toks.length >= 5)
        (0 to toks.length - 5).map(i => (toks.slice(i, i + 5).mkString(" "), id))
      else Seq.empty
    }
    val df2 = grams.groupBy(_._1).collect {
      case (g, occ) if occ.map(_._2).distinct.size >= 2 => g }.toSet
    val posDocs = grams.collect { case (g, id) if df2(g) => id }.toSet
    val pts = docs.map(d => (d._2, if (posDocs(d._1)) 1L else 0L))
    val nn = pts.length.toLong
    val pp = pts.map(_._2).sum
    val vs = pts.map(_._1).distinct.sorted
    val best = vs.dropRight(1).map { v =>
      val left = pts.filter(_._1 <= v)
      val cn = left.length.toLong; val cp = left.map(_._2).sum
      val score = cp * (cn - cp) * 1000000L / cn +
        (pp - cp) * ((nn - cn) - (pp - cp)) * 1000000L / (nn - cn)
      (score, v, cn, cp)
    }.minBy(x => (x._1, x._2))
    assert(out.getLong(0) == best._2, "best threshold")
    assert(out.getLong(1) == best._1, "gini score")
    assert(out.getLong(2) == best._3 && out.getLong(3) == best._4, "left cell")
    assert(out.getLong(4) == nn - best._3 && out.getLong(5) == pp - best._4, "right cell")
  }

  test("dau_stickiness: full replay of the day-over-day set algebra") {
    val out = graft.SparkEntry.queries("dau_stickiness")(spark, dir)
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ud = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val byDay = ud.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._1).toSet }
    val expected = byDay.keys.toSeq.sorted.flatMap { d =>
      byDay.get(d - 1).map { prev =>
        val cur = byDay(d)
        d -> (cur.size.toLong, prev.size.toLong, (cur intersect prev).size.toLong)
      }
    }.toMap
    assert(out == expected, "per-day (dau, prev_dau, returning) replay")
  }

  test("winsorized_mean_value: clamp replay vs the definitional sorted form") {
    val out = graft.SparkEntry.queries("winsorized_mean_value")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val evs = graft.Tables.load(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))
    val expected = evs.groupBy(_._1).map { case (t, rs) =>
      val cents = rs.map(_._2).sorted
      val n = cents.length.toLong; val k = (n / 20).toInt
      val low = cents(k); val high = cents((n - k - 1).toInt)
      val clamped = cents.map(c => math.max(low, math.min(high, c)))
      t -> (n, k.toLong, low, high,
        clamped.sum.toDouble / (n * 100L).toDouble)
    }
    assert(out == expected,
      "overlap-counted winsorization must equal the definitional clamp")
  }

  test("repetition_ratio: full replay of the top-token-share banding") {
    val out = graft.SparkEntry.queries("repetition_ratio")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .map { r =>
        val counts = r.getString(1).split(" ", -1)
          .groupBy(identity).view.mapValues(_.length.toLong)
        val n = counts.values.sum
        (r.getString(0), counts.values.max * 1000000L / n)
      }
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val flagged = ds.count(_._2 > 300000L).toLong
      val nSrc = ds.length.toLong
      ds.groupBy(d =>
          if (d._2 <= 100000L) 0L else if (d._2 <= 300000L) 1L
          else if (d._2 <= 500000L) 2L else 3L)
        .map { case (b, g) =>
          (src, b) -> (g.size.toLong, flagged, flagged.toDouble / nSrc) }
    }
    assert(out == expected, "per-(source, band) replay")
    assert(out.keys.map(_._2).forall(b => b >= 0 && b <= 3))
  }

  test("dup_span_sources: rolling-hash pair counts == md5-gram pair counts") {
    val base = graft.Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 50)
    val md5Grams = base
      .select(col("source"), explode(expr("sequence(1, size(toks) - 49)")).as("p"), col("toks"))
      .select(col("source"), expr("md5(array_join(slice(toks, int(p), 50), ' '))").as("gh"))
      .distinct()
    val expected = md5Grams.as("a").join(md5Grams.as("b"),
        col("a.gh") === col("b.gh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source"), col("b.source")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val out = graft.SparkEntry.queries("dup_span_sources")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == expected, "cross-source shared-window counts must match the md5 grain")
  }
}

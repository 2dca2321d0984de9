package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the round-9 operators — the DuckDB oracle pins
  * exact values at the gate; these pin the invariants that survive any
  * corpus: in-process replays of the integer algebra, conservation
  * identities, monotonicity, and the exact ties between composed
  * operators (acf_lags ↔ volume_autocorr, ivf_probe_curve ↔ recall_at_k).
  */
class R9OpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** (type → day-ordered daily counts) — the shared series the trend
    * operators all consume. */
  private lazy val dailySeries: Map[String, Seq[Long]] =
    graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rs) => t -> rs.sortBy(_._2.toEpochDay).map(_._3).toSeq }

  private lazy val dailyWithDays: Map[String, Seq[(Long, Long)]] =
    graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rs) => t -> rs.map(x => (x._2, x._3)).sortBy(_._1).toSeq }

  test("theil_sen_trend: replay — median pairwise slope by the exact key order") {
    val rows = graft.SparkEntry.queries("theil_sen_trend")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    dailyWithDays.foreach { case (t, series) =>
      val pairs = for {
        i <- series.indices; j <- series.indices if j > i
      } yield {
        val num = series(j)._2 - series(i)._2
        val den = series(j)._1 - series(i)._1
        val key = (num + 10000000L * den) * 1000000L / den
        (key, num, den, series(i)._1, series(j)._1)
      }
      val sorted = pairs.sortBy(p => (p._1, p._2, p._3, p._4, p._5))
      val med = sorted((sorted.size + 1) / 2 - 1)
      val (np, num, den, slope) = rows(t)
      assert(np == pairs.size.toLong, s"$t pair count")
      assert(num == med._2 && den == med._3, s"$t median pair")
      assert(slope == num.toDouble / den.toDouble, s"$t slope division")
    }
  }

  test("mann_kendall_trend: replay — S, tie-corrected var18, verdict rule") {
    val rows = graft.SparkEntry.queries("mann_kendall_trend")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    dailySeries.foreach { case (t, cs) =>
      val s = (for { i <- cs.indices; j <- cs.indices if j > i }
        yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
      val n = cs.size.toLong
      val tt = cs.groupBy(identity).values
        .map(g => { val k = g.size.toLong; k * (k - 1) * (2 * k + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tt
      val (nd, ss, v18, z, trend) = rows(t)
      assert(nd == n && ss == s && v18 == var18, s"$t sufficient stats")
      if (s != 0 && var18 > 0) {
        val zExp = (s - math.signum(s.toDouble).toLong).toDouble /
          math.sqrt(var18.toDouble / 18.0)
        assert(z == zExp, s"$t z chain")
        val sig = BigInt(180000) * BigInt(s.abs - 1) * BigInt(s.abs - 1) >
          BigInt(38416) * BigInt(var18)
        assert(trend == (if (sig) math.signum(s.toDouble).toInt else 0), s"$t verdict")
      } else assert(z == 0.0 && trend == 0, s"$t degenerate")
    }
  }

  test("runs_test_volume: replay — runs count, signs vs own median, verdict") {
    val rows = graft.SparkEntry.queries("runs_test_volume")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getInt(6))).toMap
    dailySeries.foreach { case (t, cs) =>
      val sortedCs = cs.sorted
      val med2 = sortedCs((cs.size - 1) / 2) + sortedCs(cs.size / 2)
      val sgns = cs.map(c => java.lang.Long.signum(2 * c - med2).toLong).filter(_ != 0)
      val runs = if (sgns.isEmpty) 0L
        else 1L + sgns.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      val n1 = sgns.count(_ == 1L).toLong
      val n2 = sgns.count(_ == -1L).toLong
      val (n, a1, a2, r, z, verdict) = rows(t)
      assert(n == n1 + n2 && a1 == n1 && a2 == n2 && r == runs, s"$t replay")
      val m2 = 2 * n1 * n2
      if (n1 > 0 && n2 > 0 && n >= 2 && m2 * (m2 - n) > 0) {
        val a = runs * n - n - m2
        val zExp = a.toDouble / math.sqrt((m2 * (m2 - n)).toDouble / (n - 1).toDouble)
        assert(z == zExp, s"$t z chain")
        val sig = BigInt(a) * BigInt(a) * BigInt(n - 1) * 10000 >
          BigInt(38416) * BigInt(m2) * BigInt(m2 - n)
        assert(verdict == (if (sig) 1 else 0), s"$t verdict")
      }
    }
  }

  test("acf_lags: lag-1 rows coincide with volume_autocorr bit-for-bit") {
    val acf = graft.SparkEntry.queries("acf_lags")(spark, dir)
      .filter(col("lag") === 1L)
      .select(col("event_type"), col("n_pairs"), col("acf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val va = graft.SparkEntry.queries("volume_autocorr")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(acf == va, "acf_lags lag-1 must equal volume_autocorr exactly")
  }

  test("acf_lags: every (type, lag) row replays from the day-ordered series") {
    val rows = graft.SparkEntry.queries("acf_lags")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    dailySeries.foreach { case (t, cs) =>
      Seq(1, 2, 3, 7).foreach { k =>
        val pairs = cs.indices.drop(k).map(i => (cs(i - k), cs(i)))
        rows.get((t, k.toLong)).foreach { case (np, acf) =>
          assert(np == pairs.size.toLong, s"$t lag $k pairs")
          val n = BigInt(pairs.size)
          val sa = BigInt(pairs.map(_._1).sum); val sb = BigInt(pairs.map(_._2).sum)
          val saa = pairs.map(p => BigInt(p._1) * p._1).sum
          val sbb = pairs.map(p => BigInt(p._2) * p._2).sum
          val sab = pairs.map(p => BigInt(p._1) * p._2).sum
          val va = n * saa - sa * sa; val vb = n * sbb - sb * sb
          val expect = if (va == 0 || vb == 0) 0.0
            else (n * sab - sa * sb).toDouble /
              (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble))
          assert(acf == expect, s"$t lag $k acf")
        }
        if (pairs.isEmpty) assert(!rows.contains((t, k.toLong)), s"$t lag $k empty")
      }
    }
  }

  test("markov_stationary: replay the 12-step integer iteration; mass conserved within floor drift") {
    val out = graft.SparkEntry.queries("markov_stationary")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // transitions replayed from the raw event stream
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4).toSeq
      s.zip(s.drop(1))
    }.toSeq
    val cnt = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tots = cnt.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val p6 = cnt.map { case ((a, b), c) => (a, b) -> c * 1000000L / tots(a) }
    val states = ev.map(_._4).distinct.sorted
    val ns = states.size
    var pi: Map[String, Long] = states.zipWithIndex.map { case (st, i) =>
      st -> (1000000L / ns + (if (i < (1000000 % ns)) 1L else 0L))
    }.toMap
    for (_ <- 1 to 12) {
      pi = p6.groupBy(_._1._2).map { case (nxt, edges) =>
        nxt -> edges.map { case ((a, _), pab) => pi.getOrElse(a, 0L) * pab / 1000000L }.sum
      }
    }
    states.foreach { st =>
      assert(out(st)._1 == pi.getOrElse(st, 0L), s"$st pi6 replay")
    }
    val mass = out.values.map(_._1).sum
    assert(mass <= 1000000L && mass >= 1000000L - 12L * ns * ns,
      s"stationary mass $mass outside floor-drift envelope")
    // empirical6 ties exactly to raw counts
    val emp = ev.groupBy(_._4).map { case (t, es) => t -> es.size.toLong }
    states.foreach { st =>
      assert(out(st)._2 == emp(st) * 1000000L / ev.length, s"$st empirical6")
    }
  }

  test("yule_k: replay from token frequencies; nonnegative on any corpus") {
    val rows = graft.SparkEntry.queries("yule_k")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    toks.groupBy(_._1).foreach { case (src, ts) =>
      val freq = ts.groupBy(_._2).map(_._2.size.toLong)
      val n = BigInt(freq.sum); val s2 = freq.map(c => BigInt(c) * c).sum
      val (nT, nTy, k) = rows(src)
      assert(nT == freq.sum && nTy == freq.size.toLong, s"$src counts")
      val expect = (BigInt(10000) * (s2 - n)).toDouble / (n * n).toDouble
      assert(k == expect, s"$src yule k")
      assert(k >= 0.0, s"$src K negative (Σc² ≥ N always)")
    }
  }

  test("sttr_diversity: replay segment distinct counts; bounds (0, 1]") {
    val rows = graft.SparkEntry.queries("sttr_diversity")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val bySrc = docs.groupBy(_._1)
    bySrc.foreach { case (src, ds) =>
      val segs = ds.flatMap { case (_, toks) =>
        (0 until toks.size / 50).map(i => toks.slice(i * 50, i * 50 + 50).distinct.size.toLong)
      }
      if (segs.nonEmpty) {
        val (nSeg, sumD, sttr) = rows(src)
        assert(nSeg == segs.size.toLong && sumD == segs.sum, s"$src segments")
        assert(sttr == segs.sum.toDouble / (segs.size * 50L).toDouble, s"$src sttr")
        assert(sttr > 0.0 && sttr <= 1.0, s"$src sttr bounds")
      } else assert(!rows.contains(src), s"$src should have no full segment")
    }
  }

  test("readability_fk: replay the integer score formula per doc") {
    val rows = graft.SparkEntry.queries("readability_fk")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val scores = ds.map { case (_, text) =>
        val w = text.split(" ").length.toLong
        val syl = "[aeiouy]+".r.findAllIn(text).size.toLong
        val sent = math.max("[.!?]".r.findAllIn(text).size.toLong, 1L)
        (206835000L * sent * w - 1015000L * w * w - 84600000L * syl * sent) /
          (sent * w)
      }
      val (n, mn, mx, mean) = rows(src)
      assert(n == scores.length.toLong, s"$src doc count")
      assert(mn == scores.min && mx == scores.max, s"$src min/max score6")
      assert(mean == scores.sum.toDouble / (n * 1000000L).toDouble, s"$src mean")
    }
  }

  test("readability_fk: the sentence/syllable counters behave on punctuated text") {
    // the corpus has no punctuation; pin the formula's punctuation path on
    // a constructed fixture through the SAME SQL expressions the query uses
    val df = spark.createDataFrame(Seq(
      (1L, "the cat sat. the dog ran! was it fun?"), // 3 sentences, 9 words
      (2L, "tsk pqrst brrr")                          // zero vowels, 1 sentence floor
    )).toDF("id", "text")
    val out = df.select(col("id"),
        size(split(col("text"), " ")).cast("long").as("w"),
        expr("cast(regexp_count(text, '[aeiouy]+') as bigint)").as("syl"),
        greatest(expr("cast(regexp_count(text, '[.!?]') as bigint)"), lit(1L)).as("sent"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((9L, 9L, 3L)), s"punctuated fixture ${out(1L)}")
    assert(out(2L)._2 == 0L && out(2L)._3 == 1L, "vowel-free doc floors at 1 sentence")
  }

  test("ivf_probe_curve: recall monotone in nprobe; probe-4 ties recall_at_k's IVF leg") {
    val curve = graft.SparkEntry.queries("ivf_probe_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(curve.nonEmpty)
    curve.groupBy(_._2).foreach { case (qid, rs) =>
      val byNp = rs.sortBy(_._1).map(_._3).toSeq
      byNp.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a, s"qid $qid recall not monotone in nprobe")
        case _ =>
      }
    }
    val p4 = curve.filter(_._1 == 4L).map(r => (r._2, r._3)).toSet
    val gate = graft.SparkEntry.queries("recall_at_k")(spark, dir)
      .filter(col("method") === "ivf_topk")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(p4 == gate, "nprobe=4 must reproduce recall_at_k's ivf_topk row exactly")
  }

  test("pq_distortion: full-corpus conservation, mean/max coherence") {
    val rows = graft.SparkEntry.queries("pq_distortion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq == (0L to 7L).toSeq, "one row per subspace")
    val nVecs = graft.Tables.load(spark, dir, "embeddings").count()
    rows.foreach { case (j, n, total, mean, mx) =>
      assert(n == nVecs, s"subspace $j must encode every vector")
      assert(total >= 0.0 && mx >= 0.0, s"subspace $j negative distortion")
      assert(mean == total / n.toDouble, s"subspace $j mean≠total/n")
      assert(mean <= mx + 1e-12, s"subspace $j mean>max")
    }
  }

  test("embedding_dim_stats: replay the quantized sums per dimension") {
    val rows = graft.SparkEntry.queries("embedding_dim_stats")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.size == 64, "one row per dimension")
    val embs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val codes = embs.flatMap { v =>
      val maxabs = v.map(x => math.abs(x.toDouble)).max
      if (maxabs <= 0) None
      else {
        val scale = 127.0 / maxabs
        Some(v.map(x => math.floor(x.toDouble * scale + 0.5).toLong))
      }
    }
    (0 until 64).foreach { d =>
      val qs = codes.map(_(d))
      val (n, sq, mean, varQ, zs) = rows(d.toLong)
      assert(n == qs.length.toLong && sq == qs.sum, s"dim $d sums")
      assert(mean == qs.sum.toDouble / qs.length, s"dim $d mean")
      val nn = BigInt(qs.length); val s1 = BigInt(qs.sum)
      val s2 = qs.map(q => BigInt(q) * q).sum
      assert(varQ == (nn * s2 - s1 * s1).toDouble / (nn * (nn - 1)).toDouble,
        s"dim $d variance")
      assert(zs == qs.count(_ == 0L).toDouble / qs.length, s"dim $d zero share")
    }
  }

  test("pareto_user_share: stitched rank ≡ plain global sort; share dominance") {
    val rows = graft.SparkEntry.queries("pareto_user_share")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L, 25L))
    val cents = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val desc = cents.sortBy { case (u, c) => (-c, u) }.map(_._2)
    val total = desc.sum
    rows.foreach { case (pct, k, topC, n, tot, share) =>
      assert(n == desc.length.toLong && tot == total, s"$pct totals")
      assert(k == (pct * n + 99) / 100, s"$pct ceil cutoff")
      assert(topC == desc.take(k.toInt).sum, s"$pct stitched rank != global sort")
      assert(share == topC.toDouble / total.toDouble, s"$pct share")
      // the top k users are the LARGEST: share must dominate the uniform cut
      assert(BigInt(topC) * n >= BigInt(total) * k, s"$pct dominance")
    }
    // shares monotone in pct
    rows.map(_._6).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, "share not monotone in pct")
      case _ =>
    }
  }

  test("weighted_reservoir: replay the A-ES grid priority via ln6Ref; top-5 per source") {
    val rows = graft.SparkEntry.queries("weighted_reservoir")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(concat(lit("wres:42|"), col("doc_id").cast("string"))).as("dg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def hex24(dg: String): Long =
      dg.take(6).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
    val expected = docs.map { case (id, src, w, dg) =>
      val u = hex24(dg) + 1
      val nlu6 = LnGrid.ln6Ref(1L << 24, u)
      (src, id, w, nlu6 * 1000000L / w)
    }.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(d => (d._4, d._2)).take(5).zipWithIndex.map { case (d, i) =>
        (src, i + 1, d._2, d._3, d._4)
      }.toSeq
    }.toSet
    assert(rows.toSet == expected, s"reservoir diverged: ${
      (rows.toSet diff expected).take(3)} vs ${(expected diff rows.toSet).take(3)}")
  }

  test("stratified_kfold: folds partition the corpus; assignment replays from md5 bands") {
    val rows = graft.SparkEntry.queries("stratified_kfold")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        md5(concat(lit("kfold:"), col("doc_id").cast("string"))).as("dg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val byCell = docs.groupBy { case (_, src, _, dg) =>
      val h2 = "0123456789abcdef".indexOf(dg(0)) * 16 + "0123456789abcdef".indexOf(dg(1))
      (h2 * 5 / 256L, src)
    }
    val srcTot = docs.groupBy(_._2).map { case (s2, ds) => s2 -> ds.size.toLong }
    val expected = byCell.map { case ((f, s2), ds) =>
      (f, s2, ds.size.toLong, ds.map(_._3).sum, ds.size.toDouble / srcTot(s2).toDouble)
    }.toSet
    assert(rows.toSet == expected, "kfold cells diverged")
    assert(rows.map(_._3).sum == docs.length.toLong, "folds must partition the corpus")
    assert(rows.map(_._1).distinct.sorted.toSeq.forall(f => f >= 0 && f <= 4))
  }

  test("session_duration_profile: replay sessionization and all statistics") {
    val rows = graft.SparkEntry.queries("session_duration_profile")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      s.foreach { e =>
        if (cur.nonEmpty && e._2 - cur.last >= 1800L * 1000000L) {
          out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        cur += e._2
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }.toSeq
    // dow of the session start in UTC, 0 = Monday (weekday()/isodow-1)
    def dow(us: Long): Long = {
      val d = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      d.getDayOfWeek.getValue.toLong - 1
    }
    sessions.groupBy(s2 => dow(s2.head)).foreach { case (d, ss) =>
      val durs = ss.map(s2 => s2.last - s2.head).sorted
      val (n, nev, mean, p50, p90) = rows(d)
      assert(n == ss.size.toLong, s"dow $d session count")
      assert(nev == ss.map(_.size.toLong).sum, s"dow $d events")
      assert(mean == durs.sum.toDouble / durs.size, s"dow $d mean")
      assert(p50 == durs(((durs.size + 1) / 2 - 1).toInt), s"dow $d p50")
      assert(p90 == durs(((durs.size * 9 + 9) / 10 - 1).toInt), s"dow $d p90")
    }
  }

  test("lifecycle_states: decomposition identity and replay from (user, week) sets") {
    val rows = graft.SparkEntry.queries("lifecycle_states")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (wk, act, nw, ret, res, _) =>
      assert(act == nw + ret + res, s"$wk: active != new+retained+resurrected")
    }
    // replay from the raw activity sets
    val uw = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val byUser = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).sortBy(_.toEpochDay).toSeq }
    val maxWk = uw.map(_._2.toEpochDay).max
    val expected = uw.map(_._2).distinct.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)).map { wk =>
      var (act, nw, ret, res, churn) = (0L, 0L, 0L, 0L, 0L)
      byUser.values.foreach { ws =>
        val i = ws.indexOf(wk)
        if (i >= 0) {
          act += 1
          if (i == 0) nw += 1
          else if (ws(i - 1).toEpochDay == wk.toEpochDay - 7) ret += 1
          else res += 1
          val next = if (i + 1 < ws.size) Some(ws(i + 1)) else None
          if (wk.toEpochDay < maxWk &&
            next.forall(_.toEpochDay > wk.toEpochDay + 7)) churn += 1
        }
      }
      (wk, act, nw, ret, res, churn)
    }
    assert(rows.toSeq == expected.toSeq, "lifecycle replay mismatch")
  }
}

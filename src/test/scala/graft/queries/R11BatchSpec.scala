package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the round-11 operator batch (the R10BatchSpec
  * discipline): full in-process replays of the integer algebra where the
  * operator is replayable from collected rows, and cross-query identities
  * where two registry queries share a mathematical relationship.
  */
class R11BatchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("mann_whitney_length: delta identity vs cliffs + direct pairwise replay") {
    val mw = graft.SparkEntry.queries("mann_whitney_length")(spark, dir).head()
    val (n1, n2, u2) = (mw.getLong(0), mw.getLong(1), mw.getLong(2))
    // cross-query identity: Cliff's delta = (2U − n1·n2)/(n1·n2)
    val cd = graft.SparkEntry.queries("cliffs_delta_length")(spark, dir).head()
    assert(cd.getLong(0) == n1 && cd.getLong(1) == n2, "group sizes diverge from cliffs")
    assert(cd.getDouble(4) == (u2 - n1 * n2).toDouble / (n1 * n2).toDouble,
      "delta != (2U - n1n2)/(n1n2)")
    // direct O(n1·n2) replay of U (gt + ties/2, kept doubled for exactness)
    val lens = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0).drop(3).toInt < 10, r.getLong(1)))
    val g1 = lens.filter(_._1).map(_._2)
    val g2 = lens.filterNot(_._1).map(_._2)
    var gt = 0L; var ties = 0L
    for (a <- g1; b <- g2) { if (a > b) gt += 1 else if (a == b) ties += 1 }
    assert(u2 == 2 * gt + ties, "2U replay")
    // z replay on the same IEEE chain
    val n = n1 + n2
    val tmass = (g1 ++ g2).groupBy(identity).values
      .map { g => val t = g.size.toLong; t * t * t - t }.sum
    val nn = BigInt(n) * n * n - n - tmass
    val denom = math.sqrt(
      (BigInt(n1) * n2).toDouble * nn.toDouble / (3.0 * n * (n - 1)))
    assert(mw.getDouble(3) == (u2 - n1 * n2).toDouble / denom, "z replay")
  }

  test("good_turing_smoothing: full replay from an independent md5 histogram") {
    val out = graft.SparkEntry.queries("good_turing_smoothing")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // independent window histogram at the md5 grain (the oracle's identity)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    graft.Tables.load(spark, dir, "documents").select("text").collect().foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      if (toks.length >= 5)
        (0 to toks.length - 5).foreach { i =>
          val w = toks.slice(i, i + 5).mkString(" ")
          val h = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
          counts(h) = counts.getOrElse(h, 0L) + 1L
        }
    }
    val ff = counts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nWindows = counts.values.sum
    val n1 = ff.getOrElse(1L, 0L)
    assert(out.nonEmpty, "vacuous GT table")
    out.foreach { case (r, (nr, nNext, rStar, nw, p0)) =>
      assert(nr == ff(r), s"N_$r replay")
      assert(nNext == ff.getOrElse(r + 1, 0L), s"N_${r + 1} replay")
      assert(rStar == (r + 1).toDouble * nNext.toDouble / nr.toDouble, s"r*($r) replay")
      assert(nw == nWindows && p0 == n1.toDouble / nWindows.toDouble, "totals replay")
    }
    assert(out.contains(1L), "no singleton row — GT regime lost")
  }

  test("l_diversity_audit: full replay of the cell accounting") {
    val out = graft.SparkEntry.queries("l_diversity_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("d"),
        floor(col("value")).cast("long").as("sens"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      // .values.map, NOT .map-to-pairs: mapping a Map to (k, l) pairs
      // re-keys by k and silently collapses cells with equal sizes
      val cells = rows.groupBy(_._2).values.map { rs =>
        (rs.size.toLong, rs.map(_._3).distinct.size.toLong) }.toSeq
      val (nCells, minL) = (cells.size.toLong, cells.map(_._2).min)
      val bad = cells.filter(_._2 < 3)
      val expected = (nCells, minL, bad.size.toLong, bad.map(_._1).sum,
        bad.map(_._1).sum.toDouble / cells.map(_._1).sum.toDouble)
      assert(out(t) == expected, s"$t l-diversity replay")
    }
  }

  test("cuped_adjustment: full replay of the moment algebra") {
    val out = graft.SparkEntry.queries("cuped_adjustment")(spark, dir).head()
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val mid = d0.plusDays((java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1) / 2)
    val users = ev.groupBy(_._1).values.map { rs =>
      (rs.filter(_._2.isBefore(mid)).map(_._3).sum,
        rs.filterNot(_._2.isBefore(mid)).map(_._3).sum)
    }.toSeq
    val bn = BigInt(users.size)
    val sx = users.map(u => BigInt(u._1)).sum
    val sy = users.map(u => BigInt(u._2)).sum
    val sxy = users.map(u => BigInt(u._1) * u._2).sum
    val sxx = users.map(u => BigInt(u._1) * u._1).sum
    val syy = users.map(u => BigInt(u._2) * u._2).sum
    val covn = bn * sxy - sx * sy
    val vxn = bn * sxx - sx * sx
    val vyn = bn * syy - sy * sy
    assert(out.getLong(0) == users.size.toLong, "n_users")
    assert(out.getDouble(1) == covn.toDouble / vxn.toDouble, "theta replay")
    assert(out.getDouble(2) ==
      covn.toDouble * covn.toDouble / (vxn.toDouble * vyn.toDouble), "rho2 replay")
    assert(out.getDouble(2) >= 0.0 && out.getDouble(2) <= 1.0, "rho2 range")
  }

  test("hll_distinct_audit: register replay + estimator error envelope") {
    val out = graft.SparkEntry.queries("hll_distinct_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val ev = graft.Tables.load(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val regs = new Array[Long](64)
      var exact = Set.empty[Long]
      rows.foreach { case (_, uid) =>
        exact += uid
        val h = md.digest(s"hll:$uid".getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h8 = Integer.parseInt(h.substring(0, 2), 16)
        val b = h8 / 4
        val sfx = h.substring(2, 17)
        val zs = sfx.takeWhile(_ == '0').length
        val rho =
          if (zs >= 15) 61L
          else {
            val cv = Integer.parseInt(sfx.charAt(zs).toString, 16)
            val lead = if (cv >= 8) 0 else if (cv >= 4) 1 else if (cv >= 2) 2 else 3
            zs * 4L + lead + 1L
          }
        regs(b) = math.max(regs(b), rho)
      }
      val present = regs.count(_ > 0)
      val vZero = 64L - present
      val s62 = regs.map(m => if (m > 0) BigInt(1) << (62 - m.toInt) else BigInt(1) << 62).sum
      val raw = ((0.709 * 4096.0) * 4611686018427387904.0) / s62.toDouble
      val est =
        if (raw <= 160.0 && vZero > 0)
          (64.0 * graft.queries.LnGrid.ln6Ref(64, math.max(vZero, 1L)).toDouble) / 1000000.0
        else raw
      val (nExact, nb, v, hraw, hest) = out(t)
      assert(nExact == exact.size.toLong, s"$t exact distinct")
      assert(nb == present.toLong && v == vZero, s"$t register occupancy")
      assert(hraw == raw && hest == est, s"$t estimator replay")
      // the sketch must actually be useful: within 5 standard errors of
      // the m = 64 asymptotic (1.04/√64 ≈ 13%)
      assert(math.abs(hest - nExact) / nExact < 0.65, s"$t estimate off: $hest vs $nExact")
    }
  }

  test("matryoshka_recall: brute-force replay on the collected embeddings") {
    val out = graft.SparkEntry.queries("matryoshka_recall")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) Double.NaN else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter(_._1 < 5)
    def top(d: Int): Set[(Long, Long)] = queries.flatMap { case (qid, qv) =>
      emb.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv, d)) }
        .filterNot(_._2.isNaN)
        .sortBy { case (cid, s) => (-s, cid) }
        .take(10).map(c => (qid, c._1))
    }.toSet
    val full = top(64)
    Seq(8, 16, 32).foreach { d =>
      val pre = top(d)
      val overlap = pre.count(full)
      val (nRanked, nOverlap, recall) = out(d)
      assert(nRanked == pre.size.toLong, s"d=$d ranked count")
      assert(nOverlap == overlap.toLong, s"d=$d overlap replay")
      assert(recall == overlap.toDouble / pre.size.toDouble, s"d=$d recall replay")
    }
  }

  test("dup_graph_assortativity: Pearson replay from the registry pair set") {
    val out = graft.SparkEntry.queries("dup_graph_assortativity")(spark, dir).head()
    spark.catalog.clearCache()
    // same threshold, same pipeline — the registry's own pair query is the
    // edge-set ground truth
    val pairs = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val sym = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = sym.map { case (a, b) => (deg(a), deg(b)) }
    val n = BigInt(xs.length)
    val sx = xs.map(x => BigInt(x._1)).sum
    val sxy = xs.map(x => BigInt(x._1) * x._2).sum
    val sxx = xs.map(x => BigInt(x._1) * x._1).sum
    val num = n * sxy - sx * sx
    val den = n * sxx - sx * sx
    assert(out.getLong(0) == pairs.length.toLong, "edge count")
    if (den == 0) assert(out.isNullAt(1))
    else assert(out.getDouble(1) == num.toDouble / den.toDouble, "assortativity replay")
  }

  test("cluster_modularity: replay from the registry labels + CC identities") {
    val out = graft.SparkEntry.queries("cluster_modularity")(spark, dir).head()
    spark.catalog.clearCache()
    val labels = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val pairs = SimilarityQueries
      .lshNearDupPairs(graft.Tables.load(spark, dir, "embeddings"), 0.40)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val m = pairs.length.toLong
    // CC identity: every edge is intra-cluster
    assert(pairs.forall(p => labels(p._1) == labels(p._2)), "inter-cluster edge?!")
    val sym = pairs ++ pairs.map(p => (p._2, p._1))
    val degC = sym.groupBy(p => labels(p._1)).view.mapValues(_.length.toLong).toMap
    val mC = pairs.groupBy(p => labels(p._1)).view.mapValues(_.length.toLong).toMap
    assert(mC.values.sum == m, "intra-cluster edges must sum to m")
    val qnum = degC.map { case (c, dc) =>
      BigInt(mC.getOrElse(c, 0L)) * m * 4 - BigInt(dc) * dc }.sum
    assert(out.getLong(0) == degC.size.toLong, "cluster count")
    assert(out.getLong(1) == m, "edge count")
    assert(out.getDouble(2) == qnum.toDouble / (BigInt(m) * m * 4).toDouble,
      "modularity replay")
    assert(out.getDouble(2) >= -0.5 && out.getDouble(2) <= 1.0, "modularity range")
  }

  test("brier_score_dup: replay from an independent md5 label pass") {
    val out = graft.SparkEntry.queries("brier_score_dup")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent label pass at the md5 grain
    val occ = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, _, text) =>
      val toks = text.split(" ", -1)
      if (toks.length >= 5)
        (0 to toks.length - 5).foreach { i =>
          val h = md.digest(toks.slice(i, i + 5).mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          occ.getOrElseUpdate(h, scala.collection.mutable.Set.empty) += id
        }
    }
    val dupDocs = occ.values.filter(_.size >= 2).flatten.toSet
    val stop = TextQueries.stopwords.toSet
    docs.groupBy(_._2).foreach { case (src, rows) =>
      var n = 0L; var nPos = 0L; var se2 = BigInt(0)
      rows.foreach { case (id, _, text) =>
        val toks = text.split(" ", -1)
        val y6 = math.floor((0.4 * math.min(1.0, toks.length.toDouble / 50.0)
          + 0.3 * (1.0 - toks.count(stop).toDouble / toks.length)
          + 0.3 * math.min(1.0, text.length.toDouble / 200.0)) * 1000000.0).toLong
        val pos = if (toks.length >= 5 && dupDocs(id)) 1L else 0L
        val e = y6 - pos * 1000000L
        n += 1; nPos += pos; se2 += BigInt(e) * e
      }
      val exp = (n, nPos, se2.toDouble / (BigInt(n) * BigInt("1000000000000")).toDouble)
      assert(out(src) == exp, s"$src brier replay")
    }
  }

  test("sprt_conversion: full replay of the integer LLR path") {
    val out = graft.SparkEntry.queries("sprt_conversion")(spark, dir).head()
    val lA6 = graft.queries.LnGrid.ln6Ref(11, 9)
    val lB6 = graft.queries.LnGrid.ln6Ref(39, 41)
    val bound6 = graft.queries.LnGrid.ln6Ref(19, 1)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var llr = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
    var h1: Option[String] = None; var h0: Option[String] = None
    daily.foreach { case (d, n, k) =>
      llr += k * lA6 + (n - k) * lB6
      mx = math.max(mx, llr); mn = math.min(mn, llr)
      if (llr >= bound6 && h1.isEmpty) h1 = Some(d)
      if (llr <= -bound6 && h0.isEmpty) h0 = Some(d)
    }
    assert(out.getLong(0) == daily.length.toLong, "n_days")
    assert(out.getLong(3) == llr, "final llr replay")
    assert(out.getLong(4) == mx && out.getLong(5) == mn, "extrema replay")
    assert(Option(out.getDate(6)).map(_.toString) == h1, "h1 crossing day")
    assert(Option(out.getDate(7)).map(_.toString) == h0, "h0 crossing day")
    val expDecision =
      if (h1.isDefined && (h0.isEmpty || h1.get <= h0.get)) "accept_h1"
      else if (h0.isDefined) "accept_h0" else "continue"
    assert(out.getString(8) == expDecision, "decision replay")
  }
}

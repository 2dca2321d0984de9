package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scale-shape guarantees for the n-gram Jaccard candidate join (r6).
  *
  * The 100 TB risk this pins: a shingle appearing in d documents contributes
  * d² rows to the candidate self-join — boilerplate shingles ("all rights
  * reserved …") have d in the millions on a web corpus, a quadratic blowup
  * concentrated on a handful of reducer keys. The df cap drops those
  * shingles BEFORE the join (candidate generation only — verification
  * against the full shingle arrays stays exact, and the uncapped DuckDB
  * oracle stays green because near-dup pairs share rare shingles).
  */
class TextQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("ngram candidate join drops shingles above the df cap (no d² blowup)") {
    import spark.implicits._
    // 60 docs all sharing one boilerplate shingle; docs 0 and 1 also share a
    // rare one. Without the cap the join would emit 60·59/2 = 1770 pairs off
    // the hot key; with it, only the rare-shingle pair survives.
    val docs = (0 until 60).map { i =>
      val own = if (i < 2) "alpha beta gamma" else s"tok$i x y"
      (i.toLong, "web", Seq("all rights reserved", own))
    }.toDF("doc_id", "source", "shingles")
    val cand = TextQueries.ngramCandidates(docs, TextQueries.NgramDfCap)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(cand == Set((0L, 1L)), s"expected only the rare pair, got $cand")
  }

  test("hot-shingle correction keeps reported jacc exact for capped pairs") {
    import spark.implicits._
    // docs 0 and 1 share two HOT shingles (df = 30 > cap) and two cold
    // ones; true jacc = |{H1,H2,r1,r2}| / |union of 6| = 2/3. The capped
    // self-join only sees the cold overlap (n_cold = 2) — the per-doc hot
    // lists must add the other 2 back, or the reported jacc would be
    // 2/(5+5-2) = 0.25.
    val hotDocs = (2 until 30).map(i =>
      (i.toLong, "web", Seq("H one 1", "H two 2", s"u$i x y")))
    val docs = (Seq(
      (0L, "web", Seq("H one 1", "H two 2", "r one 1", "r two 2", "r three 3")),
      (1L, "web", Seq("H one 1", "H two 2", "r one 1", "r two 2", "r four 4"))) ++ hotDocs)
      .toDF("doc_id", "source", "shingles")
    val out = TextQueries.ngramJaccardPairs(docs, TextQueries.NgramDfCap, 0.2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((0L, 1L, 4.0 / 6.0)), s"got $out")
  }

  test("df cap is candidate-invariant at EVERY gated sf (near-dups share rare shingles)") {
    // Measured: every qualifying pair at sf0.001/0.01/0.1 shares a shingle
    // with df <= 2, far under the cap of 8 — so even the CANDIDATE set
    // (stronger than the final output) is unchanged by capping. If corpus
    // regeneration ever plants near-dups that only share hot shingles, this
    // fails loudly instead of the oracle silently losing pairs. A dup
    // CLUSTER of > cap docs would make all its shared shingles hot (df ≈
    // cluster size — see NgramDfCap scaladoc), which is exactly the shape
    // this would catch, so it runs at every sf the driver gates, not just
    // the smallest (r7, advisor finding).
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val sh = graft.Tables.load(spark, sfDir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("shingles", expr(TextQueries.shinglesExpr))
        .select("doc_id", "source", "shingles")
      def pairs(cap: Int) = TextQueries.ngramCandidates(sh, cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val capped = pairs(TextQueries.NgramDfCap)
      val uncapped = pairs(Int.MaxValue)
      assert(capped == uncapped,
        s"$sfDir: cap dropped candidates: ${uncapped.diff(capped).take(5)}")
      assert(capped.nonEmpty, s"$sfDir: no candidates at all")
    }
  }

  test("nearDupPairsSharedHandle: one cached pair frame reproduces all four consumers") {
    // the 100 TB audit path: candidate generation runs ONCE, the four
    // pair-graph consumers read the shared cached frame and must be
    // row-identical to their independently-gated registry twins
    val (pairs, release) = TextQueries.nearDupPairsSharedHandle(spark, dir)
    try {
      assert(pairs.storageLevel.useMemory, "shared pair frame must be cached")
      val labels = TextQueries.clusterLabels(pairs)
      val docs = graft.Tables.load(spark, dir, "documents")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
      assert(rows(TextQueries.dupMatrixFrom(pairs, docs)) ==
        rows(graft.SparkEntry.queries("source_dup_matrix")(spark, dir)),
        "dup matrix drifted from registry")
      assert(rows(TextQueries.survivorshipFrom(labels, docs)) ==
        rows(graft.SparkEntry.queries("dedup_survivorship")(spark, dir)),
        "survivorship drifted from registry")
      assert(rows(TextQueries.clusterProfileFrom(labels)) ==
        rows(graft.SparkEntry.queries("dup_cluster_profile")(spark, dir)),
        "cluster profile drifted from registry")
      assert(rows(labels.select(col("id").as("doc_id"), col("label").as("cluster"))
          .orderBy("doc_id")) ==
        rows(graft.SparkEntry.queries("dedup_minhash_clusters")(spark, dir)),
        "cluster labels drifted from registry")
    } finally release()
  }

  test("tokenizer_fertility: totals conserve token_count_regex; ratios well-formed") {
    val fert = graft.SparkEntry.queries("tokenizer_fertility")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(fert.nonEmpty)
    // the same regex drives token_count_regex: corpus totals must agree
    val tc = graft.SparkEntry.queries("token_count_regex")(spark, dir)
      .collect().map(r => (r.getInt(1).toLong, r.getInt(2).toLong))
    assert(fert.map(_._5).sum == tc.map(_._1).sum, "bpeish total mismatch")
    assert(fert.map(_._4).sum == tc.map(_._2).sum, "ws total mismatch")
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(fert.map(_._3).sum == nDocs)
    fert.foreach { case (src_, lang, n, ws, bp, ch, f1, cpt) =>
      assert(f1 >= 1.0, s"$src_/$lang fertility $f1 < 1 (regex splits, never merges)")
      assert(math.abs(f1 - bp.toDouble / ws) < 1e-12)
      assert(cpt > 0 && math.abs(cpt - ch.toDouble / bp) < 1e-12)
    }
  }

  test("zipf_fit: slope negative, naive double regression agrees to 1e-6") {
    val r = graft.SparkEntry.queries("zipf_fit")(spark, dir).collect().head
    val (n, slope, intercept) = (r.getInt(0), r.getDouble(1), r.getDouble(2))
    assert(n >= 2 && n <= 100)
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    // independent naive recompute over the same top-n vocabulary
    val vocab = graft.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(r2 => (r2.getString(0), r2.getLong(1)))
    val top = vocab.sortBy { case (t, c) => (-c, t) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val nn = pts.length.toDouble
    val naiveSlope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    val naiveIcpt = (sy - naiveSlope * sx) / nn
    assert(pts.length == n)
    assert(math.abs(slope - naiveSlope) < 1e-6, s"slope $slope vs naive $naiveSlope")
    assert(math.abs(intercept - naiveIcpt) < 1e-6, s"intercept $intercept vs naive $naiveIcpt")
  }

  test("lang_confusion: conserves docs, shares normalize, agrees with lang_id row-by-row") {
    val conf = graft.SparkEntry.queries("lang_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(conf.nonEmpty)
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(conf.map(_._3).sum == nDocs, "confusion mass must conserve the corpus")
    conf.groupBy(_._1).foreach { case (lang, rs) =>
      val s = rs.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$lang shares sum to $s")
    }
    // independent recompute from lang_id's own output joined to the labels
    val preds = graft.SparkEntry.queries("lang_id")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val recount = labels.groupBy { case (id, lang) => (lang, preds(id)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    assert(conf.map(c => (c._1, c._2) -> c._3).toMap == recount,
      "confusion counts != recount from lang_id output")
  }

  test("source_dup_matrix: pair mass conserves dedup_minhash_lsh exactly") {
    val matrix = graft.SparkEntry.queries("source_dup_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(matrix.nonEmpty)
    matrix.foreach { case (x, y, n) =>
      assert(x <= y, s"($x, $y) not unordered-normalized"); assert(n > 0)
    }
    // the matrix must partition the dedupper's verified pair set
    val srcOf = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1))))
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
    spark.catalog.clearCache()
    val recount = pairs.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(matrix.map(m => (m._1, m._2) -> m._3).toMap == recount,
      "matrix != recount from the gated pair set")
  }

  test("minhash_est_error: estimate on the k/8 grid, flag exact, covers the LSH dedup pairs") {
    val rows = graft.SparkEntry.queries("minhash_est_error")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, m, est, tj, flag) =>
      assert(a < b)
      assert(m >= 0 && m <= 8, s"matches $m out of [0,8]")
      assert(est == m.toDouble / 8.0, "estimate not on the k/8 grid")
      assert(tj >= 0.0 && tj <= 1.0)
      assert(flag == (math.abs(est - tj) > 0.25),
        s"($a,$b) large_err flag disagrees with |${est - tj}| > 0.25")
    }
    // every verified near-dup pair (jacc >= 0.5) from dedup_minhash_lsh must
    // appear here: this query evaluates the SAME candidate generation,
    // before the verify threshold
    val dedup = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r._1, r._2)).toSet
    assert(dedup.subsetOf(got), s"missing LSH pairs: ${dedup.diff(got)}")
    spark.catalog.clearCache()
  }

  /** In-process union-find — the independent model the CC-based cluster
    * queries are checked against. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("er_entity_clusters: distributed CC agrees with in-process union-find") {
    val pairs = graft.SparkEntry.queries("er_blocking_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val expect = unionFind(pairs.toSeq)
    val got = graft.SparkEntry.queries("er_entity_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expect,
      "entity labels != union-find over er_blocking_pairs")
    // n_members is consistent with the label multiset; canonical id is a member
    val sizes = got.groupBy(_._2).map { case (e, xs) => e -> xs.length.toLong }
    got.foreach { case (_, e, n) => assert(n == sizes(e)) }
    got.groupBy(_._2).foreach { case (e, xs) =>
      assert(xs.map(_._1).min == e, s"entity $e is not its min member")
      assert(xs.length >= 2, "every clustered doc has at least one pair partner")
    }
  }

  test("dup_cluster_profile: conserves dedup_minhash_clusters mass exactly") {
    val labels = graft.SparkEntry.queries("dedup_minhash_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val profile = graft.SparkEntry.queries("dup_cluster_profile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(profile.nonEmpty)
    val expect = labels.groupBy(_._2).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    assert(profile.map(p => p._1 -> p._2).toMap == expect,
      "histogram != recount from the cluster labels")
    profile.foreach { case (sz, n, red) =>
      assert(sz >= 2, "a CC node always has an edge partner")
      assert(red == (sz - 1) * n, "n_redundant must be (size-1)*n_clusters")
    }
    assert(profile.map(p => p._1 * p._2).sum == labels.length.toLong,
      "Σ size·count must equal the number of clustered docs")
  }

  test("heaps_law_fit: 64 checkpoints, beta well-formed, naive recompute agrees") {
    val r = graft.SparkEntry.queries("heaps_law_fit")(spark, dir).collect().head
    val (n, beta, lnK) = (r.getInt(0), r.getDouble(1), r.getDouble(2))
    assert(n == 64, s"expected the full 64-bucket grid, got $n")
    // On this synthetic corpus the fixed ~60-word vocabulary saturates in
    // the very first checkpoint, so the growth curve is FLAT and beta = 0
    // exactly — the "templated corpus" verdict the operator exists to
    // deliver. Natural text would land in (0.4, 0.6); assert only the
    // well-formed range here and pin the value via the naive recompute.
    assert(beta >= 0.0 && beta < 1.0, s"Heaps exponent out of range: $beta")
    // independent naive recompute: per-doc token lists -> bucketed
    // cumulative (N, V) -> unrounded double regression
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(row => (row.getLong(0), row.getString(1).split(" ").toSeq))
    val md = docs.map(_._1).max
    def bucket(id: Long) = ((id * 64) / (md + 1)).toInt
    val toksPerB = docs.groupBy(d => bucket(d._1))
      .map { case (b, ds) => b -> ds.map(_._2.length.toLong).sum }
    val firstB = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).map { case (_, xs) => bucket(xs.map(_._2).min) }
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val bs = toksPerB.keys.toSeq.sorted
    var (cn, cv) = (0L, 0L)
    val pts = bs.map { b =>
      cn += toksPerB(b); cv += firstB.getOrElse(b, 0L)
      (math.log(cn.toDouble), math.log(cv.toDouble))
    }
    val nn = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val naiveBeta = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    val naiveLnK = (sy - naiveBeta * sx) / nn
    assert(pts.length == n)
    assert(math.abs(beta - naiveBeta) < 1e-5, s"beta $beta vs naive $naiveBeta")
    assert(math.abs(lnK - naiveLnK) < 1e-4, s"ln_k $lnK vs naive $naiveLnK")
  }

  test("token_burstiness: fano matches naive per-token recompute") {
    val got = graft.SparkEntry.queries("token_burstiness")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 100)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0).split(" "))
    val d = docs.length.toLong
    got.foreach { case (tok, nTotal, df, fano) =>
      val cs = docs.map(_.count(_ == tok).toLong).filter(_ > 0)
      assert(cs.sum == nTotal && cs.length.toLong == df, s"counts drift for '$tok'")
      val s2 = cs.map(c => c * c).sum
      val expect = (d * s2 - nTotal * nTotal).toDouble / (d * nTotal).toDouble
      assert(fano == expect, s"fano($tok) = $fano, expected $expect")
      assert(fano > 0.0)
    }
    // ranked by corpus frequency, ties by token
    assert(got.map(g => (-g._2, g._1)).sameElements(got.map(g => (-g._2, g._1)).sorted),
      "rows not in (n_total desc, tok) order")
  }
}

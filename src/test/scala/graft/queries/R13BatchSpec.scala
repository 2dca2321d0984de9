package graft.queries

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Semantic contracts for the round-13 fixes and operators.
  *
  * The r12 advice found hodges_lehmann_shift's weighted-median thresholds
  * off by one — undetectable on the sf0.001 corpus because the straddled
  * adjacent ranks share a value there, and undetectable by the oracle
  * because the SQL copied the same conditions. The cure is SYNTHETIC
  * sharpness fixtures where the lower and upper middles genuinely differ
  * (even pair count), collapse (odd), and degenerate (a single pair):
  * each case distinguishes the correct floor((P+1)/2) / floor(P/2)+1
  * order statistics from every adjacent mis-ranking.
  */
class R13BatchSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a synthetic documents.parquet of (source, text, n_chars) rows
    * into a fresh temp dir and return the dir (the registry queries load
    * tables by directory, so a crafted corpus drops straight in). */
  private def docsDir(rows: Seq[(String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r13").toString
    val data = rows.zipWithIndex.map { case ((src, text, nc), i) =>
      Row(i.toLong, text, "en", src, nc)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def hl(dir: String): Row =
    graft.SparkEntry.queries("hodges_lehmann_shift")(spark, dir).collect().head

  test("hodges_lehmann_shift: even pair count with DISTINCT middles averages them") {
    // g1 (src1, id < 10) lengths {10, 14}; g2 (src20) lengths {1, 3}
    // diffs sorted = [7, 9, 11, 13], P = 4: lower middle = rank 2 = 9,
    // upper middle = rank 3 = 11, HL = 10.0. The pre-fix thresholds
    // selected ranks 3 and 3 -> HL 11.
    val dir = docsDir(Seq(
      ("src1", "a", 10L), ("src1", "a", 14L),
      ("src20", "a", 1L), ("src20", "a", 3L)))
    val r = hl(dir)
    assert(r.getLong(3) == 9L && r.getLong(4) == 11L,
      s"middles: got ${r.getLong(3)},${r.getLong(4)} want 9,11")
    assert(r.getDouble(5) == 10.0, s"hl_shift: got ${r.getDouble(5)} want 10.0")
  }

  test("hodges_lehmann_shift: odd pair count returns the single median") {
    // g1 {10, 14, 20}, g2 {1}: diffs = [9, 13, 19], P = 3: both middles =
    // rank 2 = 13. Pre-fix d_hi picked rank 3 -> HL 16.
    val dir = docsDir(Seq(
      ("src1", "a", 10L), ("src1", "a", 14L), ("src1", "a", 20L),
      ("src20", "a", 1L)))
    val r = hl(dir)
    assert(r.getLong(3) == 13L && r.getLong(4) == 13L,
      s"middles: got ${r.getLong(3)},${r.getLong(4)} want 13,13")
    assert(r.getDouble(5) == 13.0, s"hl_shift: got ${r.getDouble(5)} want 13.0")
  }

  test("hodges_lehmann_shift: a single pair is its own median (P = 1)") {
    // Pre-fix, d_hi's cw*2 >= P+2 = 3 was never satisfiable at cw = 1 ->
    // hl_shift NULL.
    val dir = docsDir(Seq(("src1", "a", 10L), ("src20", "a", 1L)))
    val r = hl(dir)
    assert(r.getLong(3) == 9L && r.getLong(4) == 9L, "middles")
    assert(!r.isNullAt(5) && r.getDouble(5) == 9.0, "hl_shift")
  }

  test("hodges_lehmann_shift: repeated values weight the pair mass") {
    // g1 {5, 5, 9}, g2 {1}: diffs = [4, 4, 8], P = 3: median = 4 (the
    // duplicated value) — pins the grid-weighted path where c1 > 1.
    val dir = docsDir(Seq(
      ("src1", "a", 5L), ("src1", "a", 5L), ("src1", "a", 9L),
      ("src20", "a", 1L)))
    val r = hl(dir)
    assert(r.getLong(3) == 4L && r.getLong(4) == 4L, "middles")
    assert(r.getDouble(5) == 4.0, "hl_shift")
  }

  test("levene_bf_test: all-constant strata report NULL F, not a division artifact") {
    // Two sources, each with constant doc length: every z = 0, ssw6d = 0.
    // The guard must yield an explicit NULL (matching the oracle's CASE),
    // never Infinity/NaN.
    val dir = docsDir(Seq(
      ("srcA", "a", 7L), ("srcA", "a", 7L), ("srcA", "a", 7L),
      ("srcB", "a", 12L), ("srcB", "a", 12L)))
    val r = graft.SparkEntry.queries("levene_bf_test")(spark, dir).collect().head
    assert(r.getLong(0) == 2L, "k")
    assert(r.getLong(3) == 0L, "ssw6")
    assert(r.isNullAt(4), s"f_bf should be NULL on zero within-variance, got ${r.get(4)}")
  }

  test("bpe_apply: full Scala replay of train-then-tokenize") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("bpe_apply")(spark, dir).collect().head
    // independent word-frequency dict + 6 greedy merge rounds (the
    // R12BatchSpec bpe_train replay, carried through to the measurement)
    var dict: Map[Vector[String], Long] = graft.Tables.load(spark, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .filter(w => w.matches("[a-z]+") && w.length >= 2)
      .groupBy(identity).view
      .map { case (w, g) => w.split("").toVector -> g.length.toLong }.toMap
    (1 to 6).foreach { _ =>
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _            =>
        }
      }
      val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x + " " + y) }
      dict = dict.toSeq.map { case (syms, cnt) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = a + b
          else acc += x
        }
        acc.toVector -> cnt
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val nWords = dict.values.sum
    val nChars = dict.map { case (syms, n) => syms.map(_.length).sum * n }.sum
    val nToks = dict.map { case (syms, n) => syms.length * n }.sum
    val nVocab = dict.keys.flatten.toSet.size
    assert(r.getLong(0) == nWords, "n_words")
    assert(r.getLong(1) == nChars, "n_chars")
    assert(r.getLong(2) == nToks, "n_tokens")
    assert(r.getLong(3) == nVocab.toLong, "n_vocab_syms")
    assert(r.getDouble(4) == nToks.toDouble / nWords, "fertility_bpe")
    assert(r.getDouble(5) == nChars.toDouble / nToks, "chars_per_token")
    // the learned vocab must actually compress: fewer tokens than chars
    assert(nToks < nChars, "merges applied")
  }

  test("ivf_pq_refined_topk: exact re-rank sims replay; recall dominates raw ADC") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val refined = graft.SparkEntry.queries("ivf_pq_refined_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(refined.nonEmpty)
    // each returned sim is the 1e-6-floored exact cosine of the pair, and
    // ranks are sim-descending per query
    refined.foreach { case (qid, cid, sim, _) =>
      val exact = math.floor(cos(emb(qid), emb(cid)) * 1e6) / 1e6
      assert(sim == exact, s"($qid,$cid): sim $sim != exact $exact")
    }
    refined.groupBy(_._1).values.foreach { rs =>
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, "sim desc")
    }
    // the refine theorem: the shortlist contains ADC's top-10, and exact
    // re-ranking can only push a TRUE hit out in favor of strictly-closer
    // vectors (themselves true hits) — so per-query recall@10 must
    // dominate raw ADC's
    val truth = graft.SparkEntry.queries("similarity_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = graft.SparkEntry.queries("ivf_pq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def hits(rows: Seq[(Long, Long)]) =
      rows.filter(truth).groupBy(_._1).view.mapValues(_.size).toMap
    val hR = hits(refined.map(t => (t._1, t._2)).toSeq)
    val hA = hits(adc.toSeq)
    (hA.keySet ++ hR.keySet).foreach { qid =>
      assert(hR.getOrElse(qid, 0) >= hA.getOrElse(qid, 0),
        s"qid $qid: refined recall ${hR.getOrElse(qid, 0)} < ADC ${hA.getOrElse(qid, 0)}")
    }
  }

  test("pipeline_curation: the quality cut IS the Otsu argmax (full Scala replay)") {
    val dir = "/root/testdata/sf0.001"
    val best = graft.SparkEntry.queries("otsu_quality_threshold")(spark, dir)
      .collect().head.getLong(0)
    val out = graft.SparkEntry.queries("pipeline_curation")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stop = graft.queries.TextQueries.stopwords.toSet
    val rows = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // exact-dedup survivors: min doc_id per lowercase-trimmed text
    val surv = rows.groupBy(_._2.trim.toLowerCase)
      .values.map(_.map(_._1).min).toSet
    val kept = rows.filter(r => surv(r._1)).flatMap { case (_, text, src) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length
      val nStop = toks.count(stop)
      val q6 = math.floor((0.4 * math.min(1.0, nTok / 50.0)
        + 0.3 * (1.0 - nStop.toDouble / nTok)
        + 0.3 * math.min(1.0, text.length / 200.0)) * 1e6).toLong
      if (q6 / 10000 > best && nTok >= 20 && nTok <= 100) Some((src, nTok.toLong))
      else None
    }
    val expect = kept.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    assert(out == expect,
      s"per-source (n_kept, total_tokens) mismatch: got $out want $expect")
  }

  test("dup_graph_kcore: planted clique survives the peel, leaves fall (replay)") {
    // 5 identical vectors (K5 clique: every degree 4 >= 3 -> the 3-core),
    // 2 copies of an orthogonal vector (one edge, degree 1 -> peeled), and
    // one zero vector (filtered by the norm guard).
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-kcore").toString
    val dim = 64
    def vec(axis: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(axis) = 1.0f; a
    }
    val rows = (0 until 5).map(i => Row(i.toLong, vec(0).toSeq, 0)) ++
      Seq(Row(5L, vec(7).toSeq, 1), Row(6L, vec(7).toSeq, 1),
        Row(7L, Array.fill(dim)(0.0f).toSeq, 2))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.SparkEntry.queries("dup_graph_kcore")(spark, dir).collect().head
    assert(r.getLong(0) == 7L, s"n_nodes: ${r.getLong(0)}")
    assert(r.getLong(1) == 11L, s"n_edges: ${r.getLong(1)}") // C(5,2) + 1
    assert(r.getLong(2) == 5L, s"core_nodes: ${r.getLong(2)}")
    assert(r.getLong(3) == 10L, s"core_edges: ${r.getLong(3)}")
    assert(r.getInt(4) == 1, s"rounds_peeled: ${r.getInt(4)}")
    assert(r.getBoolean(5), "converged")
    assert(r.getDouble(6) == 10.0 / 11.0, "core_edge_share")
  }

  test("dup_graph_kcore: Scala peel replay on the corpus pair graph") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("dup_graph_kcore")(spark, dir).collect().head
    val pairs = graft.queries.SimilarityQueries
      .lshNearDupPairsBandLocal(
        graft.Tables.load(spark, dir, "embeddings"), 0.40)
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    spark.catalog.clearCache()
    var edges = pairs
    var rounds = 0
    var converged = edges.isEmpty
    var k = 0
    while (k < 12 && !converged) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val next = edges.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
      if (next.size == edges.size) converged = true
      else { rounds += 1; edges = next }
      k += 1
    }
    val nodes0 = pairs.flatMap(e => Seq(e._1, e._2))
    val coreNodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(r.getLong(0) == nodes0.size.toLong, "n_nodes")
    assert(r.getLong(1) == pairs.size.toLong, "n_edges")
    assert(r.getLong(2) == coreNodes.size.toLong, "core_nodes")
    assert(r.getLong(3) == edges.size.toLong, "core_edges")
    assert(r.getInt(4) == rounds, "rounds_peeled")
    assert(r.getBoolean(5) == converged, "converged")
  }

  private def dailyCounts(dir: String): Map[String, Seq[Long]] =
    graft.Tables.load(spark, dir, "events")
      .selectExpr("event_type", "cast(ts as date) as d")
      .groupBy("event_type", "d").count()
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("ljung_box: n-scaled autocovariances and the fixed Q chain replay bit-exact") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("ljung_box")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    dailyCounts(dir).foreach { case (t, cs) =>
      val n = cs.length
      if (n > 7) {
        val sc = cs.sum
        val y = cs.map(c => BigInt(n) * c - sc)
        val c0 = y.map(v => v * v).sum
        def ck(k: Int) = (k until n).map(i => y(i) * y(i - k)).sum
        // the SAME left-folded expression tree as the query
        val q = (n * (n + 2)).toDouble * (1 to 7).map { k =>
          (ck(k).toDouble / c0.toDouble) * (ck(k).toDouble / c0.toDouble) /
            (n - k).toDouble
        }.reduce(_ + _)
        val (gn, gq, gf) = out(t)
        assert(gn == n.toLong, s"$t n_days")
        assert(java.lang.Double.doubleToLongBits(gq)
          == java.lang.Double.doubleToLongBits(q), s"$t q bits")
        assert(gf == (q > 14.067), s"$t flag")
      }
    }
  }

  test("dup_graph_pagerank: full Scala replay of the 5 damped iterations") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("dup_graph_pagerank")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val pairs = graft.queries.SimilarityQueries
      .lshNearDupPairsBandLocal(
        graft.Tables.load(spark, dir, "embeddings"), 0.40)
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    spark.catalog.clearCache()
    val sym = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = sym.map(_._1).distinct.sorted
    val n = nodes.length
    def g6(x: Double): Double = math.floor(x * 1e6) / 1e6
    // exact-decimal sums on the 6dp grid: accumulate in micro-units (Long)
    var pr: Map[Long, Double] = nodes.map(_ -> g6(1.0 / n)).toMap
    (1 to 5).foreach { _ =>
      val acc = new scala.collection.mutable.HashMap[Long, Long]()
      sym.foreach { case (a, b) =>
        val c = g6(pr(a) * g6(1.0 / deg(a)))
        acc(b) = acc.getOrElse(b, 0L) + math.round(c * 1e6)
      }
      pr = nodes.map { id =>
        id -> g6(0.15 / n + 0.85 * (acc.getOrElse(id, 0L).toDouble / 1e6))
      }.toMap
    }
    val expect = pr.toSeq.sortBy { case (id, p) => (-p, id) }.take(20)
      .zipWithIndex.map { case ((id, p), i) => (i + 1, id, p) }
    assert(out.toSeq == expect,
      s"pagerank replay mismatch:\n got ${out.toSeq}\nwant $expect")
  }

  test("cochran_q: unanimous rule passes report NULL Q and a false flag") {
    // Every doc passes all three rules (>= 200 chars, >= 2 Gopher stops,
    // >= 20 tokens): sum_l = 3N, sum_l2 = 9N, denominator 3*sum_l - sum_l2
    // = 0. The guard must yield q_stat NULL and rules_differ_flag false
    // (COALESCE), matching the oracle.
    val text = Seq.fill(3)("the be to of and that have with").mkString(" ")
    val dir = docsDir(Seq(
      ("srcA", text, 250L), ("srcA", text, 300L), ("srcB", text, 201L)))
    val r = graft.SparkEntry.queries("cochran_q")(spark, dir).collect().head
    assert(r.getLong(4) == 9L && r.getLong(5) == 27L, "sum_l / sum_l2")
    assert(r.isNullAt(6), s"q_stat should be NULL, got ${r.get(6)}")
    assert(!r.getBoolean(7), "rules_differ_flag must coalesce to false")
  }
}

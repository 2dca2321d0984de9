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

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant tests for the round-5 curation/privacy/PQ operators — the
  * DuckDB oracle pins exact values at the gate; these pin the *semantic
  * contracts* that survive any corpus: conservation (nothing lost or
  * double-counted), ordering, and bounds.
  */
class CurationQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("sample_temperature: min source keeps everything; rates monotone in size") {
    val rows = graft.SparkEntry.queries("sample_temperature")(spark, dir)
      .select("source", "n_total", "n_kept", "keep_rate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, total, kept, rate) =>
      assert(rate > 0 && rate <= 1.0, s"$src rate $rate out of (0,1]")
      assert(kept <= total, s"$src kept $kept > total $total")
    }
    val minTotal = rows.map(_._2).min
    rows.filter(_._2 == minTotal).foreach { case (src, total, kept, rate) =>
      assert(rate == 1.0 && kept == total, s"min source $src must keep all: $kept/$total rate $rate")
    }
    // bigger source ⇒ smaller-or-equal keep rate (k_s = sqrt(N_min/N_s))
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, t1, _, r1), (_, t2, _, r2)) =>
        if (t1 < t2) assert(r2 <= r1, s"rate not monotone: n=$t1→$r1 but n=$t2→$r2")
      case _ =>
    }
  }

  test("tfidf_topterms: per-doc ranks contiguous, scores non-increasing") {
    val rows = graft.SparkEntry.queries("tfidf_topterms")(spark, dir)
      .select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to rs.length),
        s"doc $doc ranks not contiguous: ${byRank.map(_._3).toSeq}")
      assert(rs.length <= 3, s"doc $doc has ${rs.length} terms")
      byRank.sliding(2).foreach {
        case Array((_, s1, _), (_, s2, _)) => assert(s1 >= s2, s"doc $doc scores increase")
        case _ =>
      }
    }
  }

  test("pseudonymize_events: conservation and suppression accounting") {
    val ev = graft.Tables.load(spark, dir, "events")
    val totalEvents = ev.count()
    val totalUsers = ev.select("user_id").distinct().count()
    val out = graft.SparkEntry.queries("pseudonymize_events")(spark, dir)
      .select("pseudo", "n_users", "n_events").collect()
    // exactly one suppressed roll-up row, NULL pseudonym
    val (sup, kept) = out.partition(_.isNullAt(0))
    assert(sup.length == 1, s"expected one roll-up row, got ${sup.length}")
    // nothing lost, nothing double-counted
    assert(out.map(_.getLong(1)).sum == totalUsers)
    assert(out.map(_.getLong(2)).sum == totalEvents)
    // the release never carries a raw id: pseudonyms are 12-char hex
    kept.foreach { r =>
      assert(r.getString(0).matches("[0-9a-f]{12}"), s"bad pseudonym ${r.getString(0)}")
      assert(r.getLong(1) == 1L)
    }
  }

  test("pack_sequences: token conservation and contiguous packs per stream") {
    val docs = graft.Tables.load(spark, dir, "documents")
      .withColumn("n_toks", size(split(col("text"), " ")))
    val totalToks = docs.agg(sum("n_toks")).head().getLong(0)
    val packs = graft.SparkEntry.queries("pack_sequences")(spark, dir)
      .select("source", "blk", "pack", "n_docs", "pack_tokens").collect()
    // every token of every doc lands in exactly one pack
    assert(packs.map(_.getLong(4)).sum == totalToks)
    assert(packs.map(_.getLong(3)).sum == docs.count())
    // pack ids within a (source, blk) stream: distinct, start at 0 (the
    // first doc's first token is always in pack 0), strictly increasing.
    // NOT asserted contiguous — a doc spanning > 2 windows legitimately
    // skips pack indices (no other doc's first token lands inside it).
    packs.groupBy(r => (r.getString(0), r.getInt(1))).foreach { case (k, rs) =>
      val ids = rs.map(_.getInt(2)).sorted.toSeq
      assert(ids.head == 0, s"stream $k first pack ${ids.head} != 0")
      assert(ids.distinct == ids, s"stream $k duplicate pack ids: $ids")
    }
  }

  test("textrank_keywords: probability-like ranks, deterministic ordering") {
    val rows = graft.SparkEntry.queries("textrank_keywords")(spark, dir)
      .select("rank", "tok", "pr").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to rows.length), "ranks not contiguous")
    rows.sliding(2).foreach {
      case Array((_, _, p1), (_, _, p2)) => assert(p1 >= p2, "pr not non-increasing")
      case _ =>
    }
    // each pr is a damped probability share: strictly positive, below 1;
    // the top-20 sum stays ≤ 1 + rounding slack (rank only leaks at
    // dangling nodes, never appears from nowhere)
    rows.foreach { case (_, tok, p) => assert(p > 0 && p < 1, s"$tok pr $p") }
    assert(rows.map(_._3).sum <= 1.000001, s"top-k pr mass > 1")
  }

  test("pq_topk: well-formed ranking, deterministic across invocations") {
    val run1 = graft.SparkEntry.queries("pq_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val run2 = graft.SparkEntry.queries("pq_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(run1.sameElements(run2), "pq_topk not deterministic")
    val byQ = run1.groupBy(_._1)
    assert(byQ.size == 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to 10), s"query $qid ranks")
      val byRank = rs.sortBy(_._4)
      byRank.sliding(2).foreach {
        case Array((_, _, d1, _), (_, _, d2, _)) =>
          assert(d1 <= d2, s"query $qid ADC distances decrease with rank")
        case _ =>
      }
      rs.foreach { case (_, cid, d, _) =>
        assert(d >= 0, s"negative ADC distance $d")
        assert(cid != qid, "self match")
      }
    }
  }

  test("ngram_novelty: first doc fully novel; novel counts partition the shingle space") {
    val rows = graft.SparkEntry.queries("ngram_novelty")(spark, dir)
      .select("doc_id", "n_shingles", "n_novel", "novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the minimum doc_id can only contain first-seen shingles
    val first = rows.minBy(_._1)
    assert(first._4 == 1.0 && first._2 == first._3, s"first doc not fully novel: $first")
    rows.foreach { case (d, n, nov, sc) =>
      assert(nov >= 0 && nov <= n, s"doc $d: novel $nov outside [0, $n]")
      assert(sc >= 0.0 && sc <= 1.0, s"doc $d: score $sc outside [0,1]")
    }
    // every distinct shingle is first-seen in exactly one doc
    val distinctShingles = graft.Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .select(explode(expr(CurationQueries.shingles5)).as("s"))
      .distinct().count()
    assert(rows.map(_._3).sum == distinctShingles,
      s"sum of novel counts ${rows.map(_._3).sum} != distinct shingles $distinctShingles")
  }

  test("source_datacard: conservation against the raw documents table") {
    val cards = graft.SparkEntry.queries("source_datacard")(spark, dir)
      .select("source", "n_docs", "n_dup_docs", "n_langs", "top_lang", "n_tokens")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(cards.map(_._2).sum == docs.count())
    val langs = docs.select("lang").distinct().count()
    cards.foreach { case (src, nDocs, nDup, nLangs, top, nToks) =>
      assert(nDup >= 0 && nDup < nDocs, s"$src dup count $nDup vs $nDocs docs")
      assert(nLangs >= 1 && nLangs <= langs, s"$src langs $nLangs")
      assert(top.nonEmpty && nToks > 0)
    }
  }

  test("decontaminate_bloom: result-identical to decontaminate, bloom prefilter engaged") {
    val exact = graft.SparkEntry.queries("decontaminate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bloom = graft.SparkEntry.queries("decontaminate_bloom")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact, "bloom-prefiltered plan must be result-identical (no false negatives)")
    // the prefilter must actually be in the executed plan, not optimized away
    val plan = graft.SparkEntry.queries("decontaminate_bloom")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "BloomFilterMightContain missing from the physical plan")
  }

  test("heldout_bigram_ppl: scores exactly the val band; log-probs non-positive") {
    val rows = graft.SparkEntry.queries("heldout_bigram_ppl")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // exactly the val-band docs with >= 2 tokens appear
    val expected = graft.Tables.load(spark, dir, "documents")
      .withColumn("h2",
        substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
      .filter(col("h2") >= "cc" && col("h2") < "e6")
      .filter(size(split(col("text"), " ")) >= 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == expected, "scored docs != val band")
    rows.foreach { case (id, n, lp) =>
      assert(n >= 1, s"doc $id has no bigrams")
      // p = (nb+1)/(na+V) <= 1 always (nb <= na, V >= 1), and LnGrid's
      // ln6 of a ratio <= 1 is <= 0 exactly (antisymmetric construction)
      assert(lp <= 0.0, s"doc $id logprob $lp positive")
    }
    // the model must NOT have seen the val docs: a val-only bigram scores
    // through the smoothing floor, which is strictly below any seen bigram's
    // maximum — sanity: mean val logprob sits below bigram_logprob's
    // in-sample mean on the same docs (memorization gap)
    val inSample = graft.SparkEntry.queries("bigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val gaps = rows.filter(r => inSample.contains(r._1))
      .map(r => inSample(r._1) - r._3)
    assert(gaps.nonEmpty && gaps.sum / gaps.size > 0,
      "held-out scores should average below the in-sample scores")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the round-8 operators — the DuckDB oracle pins
  * exact values at the gate; these pin the invariants that survive any
  * corpus: conservation, bounds, monotonicity, and the exact algebraic
  * ties between composed operators.
  */
class R8OpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("pack_efficiency: token conservation, waste bounds, packs monotone in L") {
    val rows = graft.SparkEntry.queries("pack_efficiency")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val perSource = graft.Tables.load(spark, dir, "documents")
      .groupBy("source").agg(sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, l, nStreams, nTok, nPacks, nPad, util) =>
      // every L sees the same token mass — the corpus totals
      assert(nTok == perSource(src), s"$src/$l token mass")
      // waste identity and bounds: only the last pack of each stream pads
      assert(nPad == nPacks * l - nTok)
      assert(nPad >= 0 && nPad < l * nStreams, s"$src/$l padding $nPad")
      assert(util > 0.0 && util <= 1.0, s"$src/$l utilization $util")
    }
    // per source: total packs never increase as L grows (ceil monotone)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byL = rs.sortBy(_._2).map(_._5)
      byL.sliding(2).foreach {
        case Array(p1, p2) => assert(p2 <= p1, s"$src packs not monotone in L")
        case _ =>
      }
    }
  }

  test("vocab_coverage: monotone in k, recomputed from the raw vocabulary") {
    val rows = graft.SparkEntry.queries("vocab_coverage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 100L, 1000L))
    rows.sliding(2).foreach {
      case Array((_, c1, _, _, v1), (_, c2, _, _, v2)) =>
        assert(c2 >= c1 && v2 >= v1, "coverage must be monotone in k")
      case _ =>
    }
    // independent recomputation from the raw token counts
    val counts = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ranked = counts.sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    rows.foreach { case (k, covered, tot, nVocab, cov) =>
      assert(tot == total && nVocab == counts.length.toLong)
      val expect = ranked.take(k.toInt).map(_._2).sum
      assert(covered == expect, s"k=$k covered $covered != $expect")
      assert(cov == covered.toDouble / total)
    }
  }

  test("transition_entropy: bounds; count-weighted mean == −mean seq logprob EXACTLY") {
    val rows = graft.SparkEntry.queries("transition_entropy")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (cur, n, nNext, h) =>
      assert(nNext >= 1 && n >= nNext)
      // 0 ≤ H ≤ ln(n_next) + grid slack (each ln6 within 2.5e-6 of true)
      assert(h >= 0.0, s"$cur entropy $h negative")
      assert(h <= math.log(nNext.toDouble) + 1e-5, s"$cur entropy $h > ln($nNext)")
    }
    // LnGrid's exact antisymmetry ties the two operators bit-for-bit:
    // entropy uses ln6(tot, c) = −ln6(c, tot), the seq scorer's model term,
    // so Σ_states tot·H == −Σ_users n·logprob·1e6 as EXACT integers — the
    // doubles they emit divide the same ints by the same 1e6-scaled counts
    val seq = graft.SparkEntry.queries("event_seq_logprob")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val wEntropy = rows.map { case (_, n, _, h) => n * h }.sum /
      rows.map(_._2).sum
    val wLogprob = seq.map { case (n, lp) => n * lp }.sum / seq.map(_._1).sum
    assert(math.abs(wEntropy + wLogprob) < 1e-12,
      s"weighted entropy $wEntropy != -weighted logprob ${-wLogprob}")
  }

  test("interp_bigram_ppl: val band identity; JM scores above add-1 on average") {
    val jm = graft.SparkEntry.queries("interp_bigram_ppl")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val add1 = graft.SparkEntry.queries("heldout_bigram_ppl")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(jm.nonEmpty)
    assert(jm.map(_._1).toSet == add1.map(_._1).toSet, "same val band")
    assert(jm.map(t => t._1 -> t._2).toMap == add1.map(t => t._1 -> t._2).toMap,
      "same per-doc bigram counts")
    jm.foreach { case (id, n, lp) =>
      assert(n >= 1 && lp <= 0.0, s"doc $id n=$n lp=$lp")
    }
    // Jelinek–Mercer backs off to the unigram instead of the uniform-V
    // floor, so it should not over-penalize seen-next-token transitions
    // the way add-1 does — the corpus-level mean reflects that
    val jmMean = jm.map(_._3).sum / jm.length
    val a1Mean = add1.map(_._3).sum / add1.length
    assert(jmMean > a1Mean,
      s"JM mean $jmMean should exceed add-1 mean $a1Mean on this corpus")
  }

  test("split_leakage: pair mass equals the gated near-dup pair count; leak flag consistent") {
    val rows = graft.SparkEntry.queries("split_leakage")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val totalPairs = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir).count()
    assert(rows.map(_._3).sum == totalPairs,
      s"cell mass ${rows.map(_._3).sum} != $totalPairs verified pairs")
    rows.foreach { case (x, y, n, leak) =>
      assert(n > 0)
      assert(x <= y, "cells must be canonically ordered")
      assert(leak == (if (x != y) 1L else 0L), s"($x, $y) leak flag")
      assert(Set("train", "val", "test")(x) && Set("train", "val", "test")(y))
    }
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length, "duplicate cells")
  }
}

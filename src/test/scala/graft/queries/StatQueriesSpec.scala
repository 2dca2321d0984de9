package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant tests for the round-7 statistical-audit operators — the DuckDB
  * oracle pins exact values at the gate; these pin the semantic contracts
  * that survive any corpus: bounds, symmetry/degeneracy behavior, and
  * cross-operator consistency with the structures they summarize.
  */
class StatQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** The query's positive label, independently derived: docs sharing at
    * least one 5-gram with another doc (dup_ngram_ratio's n_dup > 0),
    * docs without 5-grams negative. */
  private def dupLabels = {
    val dnr = graft.SparkEntry.queries("dup_ngram_ratio")(spark, dir)
      .select(col("doc_id"), (col("n_dup") > 0).as("pos"))
    graft.Tables.load(spark, dir, "documents")
      .join(dnr, Seq("doc_id"), "left")
      .select(col("n_chars"), coalesce(col("pos"), lit(false)).as("pos"))
  }

  test("auc_dup_quality: bounds, label accounting vs dup_ngram_ratio, signal direction") {
    val r = graft.SparkEntry.queries("auc_dup_quality")(spark, dir).collect().head
    val (np, nn, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0.0 && auc <= 1.0, s"AUC $auc out of [0,1]")
    // label accounting must agree with the independent operator that
    // DEFINES the signal: positives = dup_ngram_ratio rows with n_dup > 0
    val expected = dupLabels.filter(col("pos")).count()
    assert(np > 0, "positive class empty — label degenerate on this corpus")
    assert(np == expected, s"n_pos $np != dup_ngram_ratio positives $expected")
    assert(np + nn == graft.Tables.load(spark, dir, "documents").count(),
      "n_pos + n_neg != corpus size")
  }

  test("auc_dup_quality: midrank formula matches a brute-force pair count") {
    // AUC ≡ (#concordant + ties/2) / (np·nn) over all pos×neg pairs —
    // check the rank-sum form against the O(n²) definition on sf0.001
    val scored = dupLabels.collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = num / (pos.length.toDouble * neg.length.toDouble)
    val auc = graft.SparkEntry.queries("auc_dup_quality")(spark, dir)
      .collect().head.getDouble(2)
    assert(math.abs(auc - brute) < 1e-12, s"rank-sum AUC $auc != brute $brute")
  }

  test("ks_source_lengths: bounds, and D = 0 on identical split") {
    val r = graft.SparkEntry.queries("ks_source_lengths")(spark, dir).collect().head
    val (n1, n2, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(d >= 0.0 && d <= 1.0, s"KS D $d out of [0,1]")
    assert(n1 > 0 && n2 > 0)
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(n1 + n2 == total, "group sizes must partition the corpus")
    // degenerate control: comparing a distribution against itself is 0 —
    // the exact integer max |f·N − f·N| collapses, no float tolerance needed
    import spark.implicits._
    val v = Seq(1L, 2L, 2L, 5L)
    val self = (v.map((_, 1L)) ++ v.map((_, 0L))).toDF("v", "g1")
    val grid = self.groupBy("v")
      .agg(sum(when(col("g1") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g1") === 0, 1L).otherwise(0L)).as("c2"))
    val win = org.apache.spark.sql.expressions.Window.orderBy("v")
    val dnum = grid
      .select(sum("c1").over(win).as("f1"), sum("c2").over(win).as("f2"))
      .agg(max(abs(col("f1") * v.length - col("f2") * v.length)))
      .collect().head.getLong(0)
    assert(dnum == 0L, s"self-comparison D_num $dnum != 0")
  }

  test("welch_ttest: group sizes partition events; t sign follows the mean gap") {
    val rows = graft.SparkEntry.queries("welch_ttest")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, dir, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "weekend + weekday counts must partition the events")
    rows.foreach { r =>
      val (m1, m2, t) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      if (t != 0.0)
        assert(math.signum(t) == math.signum(m1 - m2),
          s"${r.getString(0)}: t $t sign disagrees with mean gap ${m1 - m2}")
    }
  }

  test("fano_burstiness: day counts agree with volume_autocorr's daily grid") {
    val rows = graft.SparkEntry.queries("fano_burstiness")(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts"))).count()
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("count").as("tot"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, tot) = daily(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n_days mismatch")
      assert(r.getDouble(3) >= 0.0, "Fano factor is non-negative")
      assert(math.abs(r.getDouble(2) - tot.toDouble / n) < 1e-9, "mean_daily mismatch")
    }
  }

  test("gini_source_tokens: bounds, and 0 for a perfectly uniform mix") {
    val r = graft.SparkEntry.queries("gini_source_tokens")(spark, dir).collect().head
    val g = r.getDouble(2)
    assert(g >= 0.0 && g < 1.0, s"Gini $g out of [0,1)")
    assert(r.getLong(0) == 20, "corpus has 20 sources")
    // uniform control via the same rank formula: x_i all equal ⇒
    // 2·Σi·x − (n+1)·Σx = 2x·n(n+1)/2 − (n+1)·nx = 0 exactly
    val n = 7L; val x = 13L
    val num = 2 * (1L to n).map(_ * x).sum - (n + 1) * n * x
    assert(num == 0L)
  }

  test("triangle_count: wedge/triangle consistency and a hand-built fixture") {
    val r = graft.SparkEntry.queries("triangle_count")(spark, dir).collect().head
    val (ne, tri, wed, trans) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(ne > 0 && ne <= 500)
    // each triangle closes exactly 3 wedges: 3T ≤ wedges, so transitivity ≤ 1
    assert(3 * tri <= wed, s"3·$tri > $wed wedges")
    assert(trans >= 0.0 && trans <= 1.0)
    // fixture: K3 plus a pendant edge — 1 triangle, 3 + 2 wedges... degree
    // sequence (2,3,2,1): wedges = 1+3+1+0 = 5, transitivity = 3/5
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")).toDF("u", "v")
    val e1 = edges.select(col("u").as("x"), col("v").as("y"))
    val e2 = edges.select(col("u").as("y"), col("v").as("z"))
    val e3 = edges.select(col("u").as("x"), col("v").as("z"))
    val t = e1.join(e2, "y").join(e3, Seq("x", "z")).count()
    assert(t == 1L, s"fixture triangles $t != 1")
    val w = edges.select(col("u").as("x")).unionByName(edges.select(col("v").as("x")))
      .groupBy("x").count()
      .agg(sum(expr("(count * (count - 1)) div 2"))).collect().head.getLong(0)
    assert(w == 5L, s"fixture wedges $w != 5")
  }

  test("er_blocking_pairs: pairs are ordered, distance-bounded, and include exact dups") {
    val rows = graft.SparkEntry.queries("er_blocking_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev) =>
      assert(a < b, s"pair ($a, $b) not ordered")
      assert(lev >= 0 && lev <= 24, s"lev $lev out of [0, 24]")
    }
    // exact-duplicate docs (same text, cold block) must appear at lev = 0
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), substring(col("text"), 1, 24).as("blk"))
    val hot = docs.groupBy("blk").count().filter(col("count") > 16).select("blk")
    val cold = docs.join(hot, Seq("blk"), "left_anti")
    val dupPair = cold.as("x").join(cold.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = rows.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    dupPair.foreach { p =>
      assert(got.contains(p), s"exact-dup pair $p missing from lev-0 pairs")
    }
  }
}

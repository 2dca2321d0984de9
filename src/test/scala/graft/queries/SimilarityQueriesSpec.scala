package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorFunctions.cosineSimilarity

/** Plan-shape and recall guarantees for the embedding near-dup path.
  *
  * The 100 TB design point demands candidate generation by signature
  * equi-join, never a cartesian: these tests pin the physical plan (no
  * CartesianProduct / BroadcastNestedLoopJoin anywhere in
  * dedup_embedding_cosine) and the LSH contract (every reported pair is a
  * true brute-force pair — precision 1 by exact-cosine verify — with
  * non-trivial recall on this corpus).
  */
class SimilarityQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_embedding_cosine plan has no cartesian or nested-loop join") {
    val df = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    spark.catalog.clearCache()
  }

  // The corpus embeddings are near-orthogonal random vectors: every brute
  // pair above 0.35 sits at sim 0.35-0.44 where a 6×6 band collision has
  // probability ~1/3 — recall decaying with angle IS the LSH contract, so
  // the bound here is the far-pair regime's, not 1. Precision is 1 at every
  // SF by the exact-cosine verify, which the subset assertion pins.
  test("LSH near-dup pairs: precision 1 vs brute force on the real corpus") {
    val lsh = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
      .select("a_id", "b_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosineSimilarity(col("av"), col("bv")))
      .filter(col("sim") >= 0.35)
      .select(col("a_id"), col("b_id"),
        (floor(col("sim") * lit(1000000.0d)) / lit(1000000.0d)).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute),
      s"LSH reported non-pairs: ${lsh.diff(brute).take(5)}")
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.2, s"far-pair recall $recall (${lsh.size}/${brute.size})")
    spark.catalog.clearCache()
  }

  // The CC loop truncates lineage each round. localCheckpoint blocks live in
  // executor storage — on a real cluster a lost executor mid-loop is fatal —
  // so when a reliable checkpoint dir is configured the loop must route
  // through fault-tolerant checkpoint() and converge to the identical
  // labeling. This pins that path (Q.truncate's cluster branch).
  test("dedup_clusters converges identically through the reliable checkpoint path") {
    def run() = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaLocal = run() // checkpoint dir unset -> localCheckpoint path
    spark.catalog.clearCache()
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val viaReliable = run()
      assert(viaReliable == viaLocal)
      assert(viaReliable.nonEmpty)
    } finally {
      // Option(null) -> None: restores the localCheckpoint path for the
      // shared session (the isLocal guard skips the non-local-path warning)
      spark.sparkContext.setCheckpointDir(null)
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptDir))
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  // THE band-local claim (r11): verify-then-distinct == distinct-then-
  // verify for a deterministic predicate, so the spill-free shape is
  // result-identical to the exact-candidate path at the same dial — at
  // BOTH registry thresholds, on the real corpus at two SFs.
  test("band-local pairs == exact-candidate pairs at the default dial") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         thr <- Seq(0.35, 0.40)) {
      val emb = graft.Tables.load(spark, d, "embeddings")
      val exact = SimilarityQueries.lshNearDupPairs(emb, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      spark.catalog.clearCache()
      val bandLocal = SimilarityQueries.lshNearDupPairsBandLocal(emb, thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      spark.catalog.clearCache()
      assert(bandLocal == exact, s"$d thr=$thr: band-local pair set diverged")
      assert(exact.nonEmpty, s"$d thr=$thr: vacuous (no pairs)")
    }
  }

  test("clustersBandLocal == dedup_clusters labeling") {
    val expected = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val got = SimilarityQueries
      .clustersBandLocal(graft.Tables.load(spark, dir, "embeddings"), 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got == expected, "band-local CC labeling diverged")
    assert(expected.nonEmpty)
  }

  // The re-shard dial's recall claim: at (24 bands × 12 bits) — the sf10
  // sizing — planted cos≈0.94 near-dups are still found (p(detect) ≈ 0.98
  // per the OR-amplification formula), while the bucket occupancy that
  // caused the sf10 spill drops 64×. Same planted-pair harness as the
  // default-dial recall test below.
  test("band-local (24,12) re-shard dial keeps planted near-dup recall") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val rows = (0 until n).flatMap { i =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      val nrm = math.sqrt(base.map(x => x.toDouble * x).sum)
      val copy = base.map(x => (x + (0.35 * nrm / 8.0 * rnd.nextGaussian()).toFloat))
      Seq((i.toLong, base), ((1000 + i).toLong, copy))
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val found = SimilarityQueries
      .lshNearDupPairsBandLocal(df, 0.9, numBands = 24, bandBits = 12)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val planted = (0 until n).map(i => (i.toLong, (1000 + i).toLong)).toSet
    assert(found.subsetOf(planted), s"non-planted pairs: ${found.diff(planted).take(5)}")
    val recall = found.size.toDouble / n
    assert(recall >= 0.85, s"planted recall at (24,12): $recall (${found.size}/$n)")
  }

  // The regime the operator exists for: TRUE near-dups. 40 seeded random
  // base vectors, each with a perturbed copy at cos ≈ 0.94; theoretical
  // band-collision probability there is ~0.99 per pair, so >= 36/40
  // recovered leaves ~4-sigma slack while still failing on any real recall
  // regression. Unrelated cross pairs sit at cos ~0 and cannot pass the 0.9
  // verify threshold, so precision stays exact.
  test("LSH near-dup pairs: recall >= 0.9 on planted near-duplicates") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val rows = (0 until n).flatMap { i =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      val nrm = math.sqrt(base.map(x => x.toDouble * x).sum)
      val copy = base.map(x => (x + (0.35 * nrm / 8.0 * rnd.nextGaussian()).toFloat))
      Seq((i.toLong, base), ((1000 + i).toLong, copy))
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val found = SimilarityQueries.lshNearDupPairs(df, 0.9)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until n).map(i => (i.toLong, (1000 + i).toLong)).toSet
    assert(found.subsetOf(planted), s"non-planted pairs: ${found.diff(planted).take(5)}")
    val recall = found.size.toDouble / n
    assert(recall >= 0.9, s"planted recall $recall (${found.size}/$n)")
    spark.catalog.clearCache()
  }

  // The SemDeDup keep-rule guarantee: after pruning, no two SURVIVING
  // same-cluster vectors are near-duplicates. (A kept vector by definition
  // has no earlier in-cluster near-dup at all, so for kept a < kept b the
  // pair (a, b) cannot be near — this is the property that makes the
  // removed set a valid dedup, not just a pair listing.) Also pins the
  // determinism anchor: the lowest-vec_id member of every cluster survives.
  test("semdedup: survivors are pairwise non-near within a cluster") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, dir, "embeddings")
    // independent assignment model: window argmin over the cross product
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))
    val assigned = emb.crossJoin(cents)
      .withColumn("d2", graft.functions.VectorFunctions.floatL2Sq(
        col("embedding"), col("centv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cent_id").as("cluster"), col("embedding"))
    val removed = graft.SparkEntry.queries("semdedup")(spark, dir)
      .select("removed_id").collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty)
    val a = assigned.select(col("cluster"), col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b_id"), col("embedding").as("bv"))
    val nearPairs = a.join(b, Seq("cluster")).filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosineSimilarity(col("av"), col("bv")))
      .filter(col("sim") >= 0.35)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val survivorNear = nearPairs.filter { case (x, y) => !removed(x) && !removed(y) }
    assert(survivorNear.isEmpty, s"near survivor pairs: ${survivorNear.take(5).toSeq}")
    // the earliest member of each cluster can have no earlier near-dup
    val clusterMin = assigned.groupBy("cluster").agg(min("vec_id").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(clusterMin.intersect(removed).isEmpty,
      s"cluster-minimum vectors removed: ${clusterMin.intersect(removed).take(5)}")
    spark.catalog.clearCache()
  }

  test("recall_at_k: bounds, independent recomputation, and the IVF≫LSH ordering") {
    val got = graft.SparkEntry.queries("recall_at_k")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 2 methods × 5 queries, recall = n_hit/10 within [0, 1]
    assert(got.length == 10)
    got.foreach { case (m, q, h, rec) =>
      assert(h >= 0 && h <= 10 && rec == h / 10.0, s"($m, $q): n_hit=$h recall=$rec")
    }
    // independent recomputation: intersect the two retrievers' outputs here
    val exact = graft.SparkEntry.queries("similarity_topk")(spark, dir)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq("ivf_topk", "lsh_topk").foreach { m =>
      val approx = graft.SparkEntry.queries(m)(spark, dir)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = exact.groupBy(_._1).map { case (q, s) =>
        q -> s.count(approx.contains).toLong }
      got.filter(_._1 == m).foreach { case (_, q, h, _) =>
        assert(h == expect(q), s"$m qid=$q: reported $h, recomputed ${expect(q)}")
      }
    }
    // the corpus-shape finding the eval exists to surface: probe-4 IVF
    // recalls most of the true top-10; a single 8-bit exact-match LSH band
    // almost never co-buckets near-orthogonal random neighbors
    val byM = got.groupBy(_._1).map { case (m, xs) => m -> xs.map(_._4).sum / xs.size }
    assert(byM("ivf_topk") >= 0.5, s"IVF recall collapsed: $byM")
    assert(byM("ivf_topk") > byM("lsh_topk") + 0.3, s"expected IVF ≫ LSH: $byM")
    spark.catalog.clearCache()
  }

  test("hard_negatives: the exact rank band below the top-k, disjoint from it, scores dominated") {
    val negs = graft.SparkEntry.queries("hard_negatives")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    val top = graft.SparkEntry.queries("similarity_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(negs.nonEmpty)
    negs.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (11 to 30), s"qid $q band ${rs.map(_._4).sorted.toSeq}")
      val topCids = top.filter(_._1 == q).map(_._2).toSet
      assert(rs.forall(n => !topCids.contains(n._2)), s"qid $q negative also in top-10")
      // every negative scores <= the weakest true positive (rank 10)
      val weakest = top.filter(_._1 == q).map(_._3).min
      rs.foreach { case (_, cid, sim, _, _) =>
        assert(sim <= weakest + 1e-9, s"qid $q cid $cid sim $sim > weakest top-10 $weakest")
      }
      assert(rs.forall(n => n._5 == 0 || n._5 == 1))
    }
  }

  test("embedding_outliers: three per label, distance non-increasing in rank, recomputed exactly") {
    val out = graft.SparkEntry.queries("embedding_outliers")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (label, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3), s"$label ranks ${rs.map(_._2).toSeq}")
      val byRank = rs.sortBy(_._2)
      byRank.sliding(2).foreach {
        case Array((_, _, _, d1), (_, _, _, d2)) =>
          assert(d1 >= d2, s"$label distances increase with rank: $d1 < $d2")
        case _ =>
      }
      rs.foreach { case (_, _, _, d) => assert(d >= 0.0) }
    }
    // independent recompute of the winner for one label: naive double math
    // agrees with the micro-quantized exact path to ~1e-5 relative
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val label0 = out.map(_._1).min
    val mine = vecs.filter(_._2 == label0)
    val cent = mine.map(_._3).transpose.map(xs => xs.sum / xs.length)
    val naive = mine.map { case (id, _, v) =>
      id -> math.sqrt(v.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum) }.toMap
    val winner = out.filter(o => o._1 == label0 && o._2 == 1).head
    val naiveTop = naive.maxBy { case (id, d) => (d, -id) }
    assert(winner._3 == naiveTop._1,
      s"$label0 winner ${winner._3} != naive argmax ${naiveTop._1}")
    assert(math.abs(winner._4 - naiveTop._2) < 1e-4,
      s"$label0 dist ${winner._4} vs naive ${naiveTop._2}")
  }

  test("retrieval_mrr: rr = 1/best_rank, positive exactly when recall_at_k found hits") {
    val mrr = graft.SparkEntry.queries("retrieval_mrr")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getInt(2), r.getDouble(3)))).toMap
    val rec = graft.SparkEntry.queries("recall_at_k")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(mrr.nonEmpty && mrr.keySet == rec.keySet)
    mrr.foreach { case (k, (br, rr)) =>
      if (br == 0) {
        assert(rr == 0.0, s"$k: no hit but rr=$rr")
        assert(rec(k) == 0L, s"$k: mrr saw no hit but recall_at_k counted ${rec(k)}")
      } else {
        assert(br >= 1 && br <= 10, s"$k: best_rank $br outside [1,10]")
        assert(rr == 1.0 / br, s"$k: rr $rr != 1/$br")
        assert(rec(k) > 0L, s"$k: mrr found rank $br but recall_at_k counted 0")
      }
    }
    spark.catalog.clearCache()
  }

  test("embedding_pca_power: unit norm on the grid; agrees with a naive double power iteration") {
    import org.apache.spark.sql.functions._
    val v = graft.SparkEntry.queries("embedding_pca_power")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(v.length == 64)
    // normalized on the 6 dp grid: ||v|| = 1 up to per-dim rounding (64 dims
    // each rounded to 1e-6 → norm² off by at most ~2·64·1e-6)
    val n2 = v.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-3, s"not unit norm: ||v||^2 = $n2")
    // independent naive recompute: double-precision Gram off the raw floats
    // (no quantization) + 5 plain-double power iterations must land within
    // ~1 degree of the exact-decimal result — the quantization/grid noise
    // is bounded far below the eigengap this corpus has
    val rows = graft.Tables.load(spark, dir, "embeddings")
      .select(col("embedding")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val g = Array.ofDim[Double](64, 64)
    rows.foreach { e =>
      var i = 0
      while (i < 64) { var j = 0; while (j < 64) { g(i)(j) += e(i) * e(j); j += 1 }; i += 1 }
    }
    var w = Array.fill(64)(0.125)
    for (_ <- 1 to 5) {
      val nw = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * w(j)).sum)
      val nn = math.sqrt(nw.map(x => x * x).sum)
      w = nw.map(_ / nn)
    }
    val cos = v.zip(w).map { case (a, b) => a * b }.sum /
      (math.sqrt(n2) * math.sqrt(w.map(x => x * x).sum))
    assert(math.abs(cos) > 0.9998, s"exact-decimal PCA diverges from naive double PCA: cos=$cos")
  }

  test("ndcg_eval: bounds, perfect-retrieval ⇒ 1, and consistency with recall_at_k") {
    val ndcg = graft.SparkEntry.queries("ndcg_eval")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val rec = graft.SparkEntry.queries("recall_at_k")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(ndcg.nonEmpty && ndcg.keySet == rec.keySet)
    ndcg.foreach { case (k, v) =>
      assert(v >= 0.0 && v <= 1.0 + 1e-9, s"$k: ndcg $v out of [0,1]")
      // zero graded mass ⟺ zero hits; full ordered recall ⇒ ndcg ≈ 1
      assert((v == 0.0) == (rec(k) == 0L), s"$k: ndcg $v vs n_hit ${rec(k)}")
      if (rec(k) == 10L) assert(v > 0.75, s"$k: full recall but ndcg only $v")
    }
    spark.catalog.clearCache()
  }
}

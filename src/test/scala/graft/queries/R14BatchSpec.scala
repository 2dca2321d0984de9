package graft.queries

import org.apache.spark.sql.Row

import graft.SparkTestBase

/** Semantic contracts for the round-14 operators: the trained residual-PQ
  * family (pq_train / ivf_pq_residual_topk / pq_train_distortion — the
  * real IVFADC, Jégou 2011 §IV), the BPE trainer memo, and bpe_apply's
  * OOV/coverage accounting.
  *
  * The strongest pin is a FULL Scala replay of pq_train at sf0.001:
  * coarse cosine assignment → double residuals → subspace slices → init
  * codebooks from vec 16..31 → 2 Lloyd rounds with the exact-decimal
  * grid6 mean discipline — every (subspace, code, dim) count and decimal
  * sum must match the distributed plan bit-for-bit. The cross-engine
  * oracle can never catch a bug both engines share (the r12
  * hodges_lehmann lesson); the replay is the third, independent
  * implementation.
  */
class R14BatchSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---- BPE memo + coverage ------------------------------------------------

  test("bpe trainer executes at most once across its three consumers") {
    // First consumer may train (or hit a memo left by an earlier suite on
    // the same (session, dir)); the next two must NEVER train again.
    graft.SparkEntry.queries("bpe_train")(spark, sf).collect()
    val afterFirst = TrainQueries.bpeTrainerRuns.get()
    graft.SparkEntry.queries("bpe_apply")(spark, sf).collect()
    graft.SparkEntry.queries("bpe_token_freq")(spark, sf).collect()
    assert(TrainQueries.bpeTrainerRuns.get() == afterFirst,
      "bpe_apply/bpe_token_freq re-ran the trainer despite the session memo")
  }

  test("bpe_apply: coverage accounting conserves corpus mass") {
    val r = graft.SparkEntry.queries("bpe_apply")(spark, sf).collect().head
    def l(n: String) = r.getLong(r.fieldIndex(n))
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    // independent recount of the corpus totals (the query derives them in
    // its own plan; this is a second derivation from the raw table)
    import org.apache.spark.sql.functions._
    val tot = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(count(lit(1)), sum(length(col("w")).cast("long")))
      .collect().head
    assert(l("n_words_all") == tot.getLong(0), "n_words_all recount")
    assert(l("n_chars_all") == tot.getLong(1), "n_chars_all recount")
    // covered slice is a strict subset on this corpus (numbers/punct exist)
    assert(l("n_words") <= l("n_words_all") && l("n_oov_words") >= 0)
    assert(l("n_chars") <= l("n_chars_all") && l("n_oov_chars") >= 0)
    assert(l("n_words") + l("n_oov_words") == l("n_words_all"), "word mass")
    assert(l("n_chars") + l("n_oov_chars") == l("n_chars_all"), "char mass")
    assert(d("covered_word_share") > 0.0 && d("covered_word_share") <= 1.0)
    assert(d("covered_char_share") > 0.0 && d("covered_char_share") <= 1.0)
  }

  // ---- residual-PQ family -------------------------------------------------

  test("pq_train_distortion: Lloyd training never increases residual distortion") {
    val rows = graft.SparkEntry.queries("pq_train_distortion")(spark, sf).collect()
    val byMethod = rows.groupBy(_.getString(0))
    assert(byMethod.keySet == Set("raw_pq", "residual_init", "residual_pq",
      "plain_trained", "opq_trained"))
    byMethod.values.foreach(g => assert(g.length == 8, "8 subspaces per method"))
    def total(m: String) =
      byMethod(m).map(r => r.getDouble(r.fieldIndex("total_d2"))).sum
    // k-means monotonicity: each Lloyd step is non-increasing in J, so the
    // trained codebooks' distortion over the SAME residuals is <= init's
    // (grid6 flooring cannot flip it at the observed ~27% margin)
    assert(total("residual_pq") <= total("residual_init"),
      s"trained ${total("residual_pq")} > init ${total("residual_init")}")
  }

  test("recall_pq_family: 5-leg ablation; refine dominates its ADC stage PER QUERY") {
    val rows = graft.SparkEntry.queries("recall_pq_family")(spark, sf).collect()
    val byQ = rows.map(r => (r.getString(0), r.getLong(r.fieldIndex("qid"))) ->
      r.getDouble(r.fieldIndex("recall"))).toMap
    val methods = rows.map(_.getString(0)).toSet
    assert(methods == Set("pq_topk", "ivf_pq_topk", "ivf_pq_refined_topk",
      "ivf_pq_residual_topk", "ivf_pq_residual_refined_topk"))
    val qids = rows.map(r => r.getLong(r.fieldIndex("qid"))).distinct
    // THEOREM, not a fixture pin: the exact re-rank of the top-50 ADC
    // shortlist can never lose a truth member the ADC top-10 had (the
    // top-10 is a subset of the shortlist, and every truth member in the
    // shortlist outranks every non-truth member under exact cosine by the
    // definition of the global top-10) — so refined recall >= its own ADC
    // stage's recall for EVERY query, on both PQ variants.
    qids.foreach { q =>
      assert(byQ(("ivf_pq_refined_topk", q)) >= byQ(("ivf_pq_topk", q)),
        s"q$q: refine lost recall vs raw ADC")
      assert(byQ(("ivf_pq_residual_refined_topk", q)) >= byQ(("ivf_pq_residual_topk", q)),
        s"q$q: residual refine lost recall vs residual ADC")
    }
    def mean(m: String) = qids.map(q => byQ((m, q))).sum / qids.length
    assert(mean("ivf_pq_residual_topk") >= mean("ivf_pq_topk"),
      "residual training must not lose recall vs raw ADC on the gate corpus")
  }

  test("dedup_policy_compare: mass conservation + policy dominance") {
    val rows = graft.SparkEntry.queries("dedup_policy_compare")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap // (policy, cluster) -> (survivor, members, total, schars, reclaimed)
    val policies = rows.keySet.map(_._1)
    assert(policies == Set("min_id", "longest", "pagerank_hub", "kcore_member"))
    val clusters = rows.keySet.map(_._2)
    policies.foreach { p =>
      assert(rows.keySet.filter(_._1 == p).map(_._2) == clusters,
        s"$p covers a different cluster set")
    }
    clusters.foreach { c =>
      val per = policies.toSeq.map(p => rows((p, c)))
      // the cluster's membership and mass are policy-INVARIANT…
      assert(per.map(t => (t._2, t._3)).distinct.size == 1,
        s"cluster $c: n_members/total_chars vary across policies")
      // …and every policy conserves it: survivor + reclaimed == total
      per.foreach { case (_, _, total, schars, reclaimed) =>
        assert(schars + reclaimed == total, s"cluster $c: mass not conserved")
      }
      // min_id keeps the CC label itself (min-label construction)
      assert(rows(("min_id", c))._1 == c, s"cluster $c: min_id survivor != label")
      // longest reclaims the least mass of any policy, by definition
      val reclaimedLongest = rows(("longest", c))._5
      per.foreach { case (_, _, _, _, rec) =>
        assert(reclaimedLongest <= rec, s"cluster $c: longest not optimal")
      }
    }
  }

  test("spherical k-means: every trained centroid sits on the unit sphere") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val withN = emb.select(col("vec_id"), col("embedding"))
      .withColumn("n2", expr(
        "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .select(col("vec_id"),
        expr("""transform(embedding,
               |  x -> CASE WHEN n2 > 0.0D THEN CAST(x AS DOUBLE) / sqrt(n2)
               |            ELSE 0.0D END)""".stripMargin).as("embedding"))
    val cents = TrainQueries.kmeansTrainLoop(withN, spherical = true)._1
      .withColumn("nrm", sqrt(expr("aggregate(centv, 0.0D, (a, x) -> a + x * x)")))
      .collect()
    assert(cents.nonEmpty)
    cents.foreach { r =>
      val n = r.getDouble(r.fieldIndex("nrm"))
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-12,
        s"centroid ${r.get(0)} norm $n off the unit sphere")
    }
  }

  test("ivf_trained_recall: three coarse retrievers, well-formed recall rows") {
    val rows = graft.SparkEntry.queries("ivf_trained_recall")(spark, sf).collect()
    val methods = rows.map(_.getString(0)).toSet
    assert(methods == Set("ivf_topk", "ivf_trained_topk", "ivf_spherical_topk"))
    rows.foreach { r =>
      val rec = r.getDouble(r.fieldIndex("recall"))
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("pq_train: full Scala replay of coarse-assign -> residual -> 2 Lloyd rounds") {
    val out = graft.SparkEntry.queries("pq_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(r.fieldIndex("n_members")), r.getDouble(r.fieldIndex("c_sum"))))
      .toMap

    val emb = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

    // cosine exactly as the codegen'd CosineSimilarity: double left folds
    def cos(a: Array[Float], b: Array[Float]): Option[Double] = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) None else Some(dot / denom)
    }
    // coarse assignment: min over (coalesce(-csim, +inf), cent_id)
    val cents = emb.filter(_._1 < 16)
    def listOf(v: Array[Float]): Long =
      cents.map { case (cid, cv) =>
        (cos(v, cv).map(-_).getOrElse(Double.PositiveInfinity), cid)
      }.min._2
    // residuals + subspace slices (all double from here)
    val rsub: Seq[(Long, Int, Array[Double])] = emb.toSeq.flatMap { case (id, v) =>
      val cv = cents.find(_._1 == listOf(v)).get._2
      val r = v.indices.map(i => v(i).toDouble - cv(i).toDouble).toArray
      (0 until 8).map(j => (id, j, r.slice(j * 8, j * 8 + 8)))
    }
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // Spark's grid6 + cast decimal(16,6): floor(x*1e6)/1e6 as a double,
    // then Decimal(double) = BigDecimal(Double.toString) scaled HALF_UP
    def grid6(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Double.toString(math.floor(x * 1e6) / 1e6))
        .setScale(6, java.math.RoundingMode.HALF_UP)

    var cb: Map[(Int, Int), Array[Double]] = rsub
      .filter(t => t._1 >= 16 && t._1 < 32)
      .map(t => ((t._2, (t._1 - 16).toInt), t._3)).toMap
    var update: Map[(Int, Int, Int), (Long, java.math.BigDecimal)] = Map.empty
    for (_ <- 1 to 2) {
      val assigned = rsub.map { case (cid, j, rs) =>
        val code = cb.collect { case ((jj, c), cv) if jj == j => (l2(rs, cv), c) }.min._2
        (j, code, rs)
      }
      update = assigned
        .flatMap { case (j, code, rs) =>
          rs.zipWithIndex.map { case (v, dim) => ((j, code, dim), v) }
        }
        .groupBy(_._1)
        .map { case (k, vs) =>
          val sum = vs.map(v => grid6(v._2)).reduce(_.add(_))
          k -> (vs.size.toLong, sum)
        }
      cb = update.toSeq
        .groupBy { case ((j, code, _), _) => (j, code) }
        .map { case (k, dims) =>
          k -> dims.sortBy(_._1._3)
            .map { case (_, (n, s)) => s.doubleValue() / n }.toArray
        }
    }

    val replay = update.map { case ((j, code, dim), (n, s)) =>
      (j.toLong, code, dim) -> (n, s.doubleValue())
    }
    assert(replay.size == out.size,
      s"row count: replay ${replay.size} vs query ${out.size}")
    replay.foreach { case (k, (n, c)) =>
      val (qn, qc) = out(k)
      assert(qn == n, s"$k n_members: query $qn replay $n")
      assert(qc == c, s"$k c_sum: query $qc replay $c")
    }
  }
}

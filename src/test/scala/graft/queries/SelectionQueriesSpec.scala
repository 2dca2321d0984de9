package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant tests for the round-7 data-selection operators. The DuckDB
  * oracle pins exact values at the gate; these pin the semantic contracts
  * the oracle can't see: the stitched-rank construction ≡ the single-reducer
  * form it replaces, split stability under corpus growth, and the
  * directional meaning of the scores.
  */
class SelectionQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("quality_buckets: stitched tercile ≡ Spark's own ntile(3)") {
    // The scale-safe (lang, floor(logprob)) shard-rank + offset + arithmetic
    // bucket must reproduce ntile(3) OVER (PARTITION BY lang ORDER BY
    // logprob DESC, doc_id) exactly — same frame Spark would build.
    val got = graft.SparkEntry.queries("quality_buckets")(spark, dir)
      .select("doc_id", "lang", "logprob", "ppl_bucket")
    val naive = got.withColumn("nt", ntile(3).over(
        Window.partitionBy("lang").orderBy(col("logprob").desc, col("doc_id"))))
      .withColumn("expect",
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail"))
    val mismatches = naive.filter(col("expect") =!= col("ppl_bucket")).count()
    assert(mismatches == 0, s"$mismatches docs bucketed differently from ntile(3)")
    // every (lang) slice has all three buckets at this corpus size, and
    // head logprobs dominate tail logprobs within a language
    val stats = naive.groupBy("lang", "ppl_bucket")
      .agg(min("logprob").as("lo"), max("logprob").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    stats.keys.map(_._1).foreach { lang =>
      val (headLo, _, _) = stats((lang, "head"))
      val (_, tailHi, _) = stats((lang, "tail"))
      assert(headLo >= tailHi, s"$lang: head min $headLo < tail max $tailHi")
    }
  }

  test("quality_buckets: tercile sizes differ by at most one per language") {
    val sizes = graft.SparkEntry.queries("quality_buckets")(spark, dir)
      .groupBy("lang", "ppl_bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    sizes.foreach { case (lang, ns) =>
      assert(ns.size == 3, s"$lang has ${ns.size} buckets")
      assert(ns.max - ns.min <= 1, s"$lang tercile sizes $ns differ by >1")
    }
  }

  test("shuffle_deterministic: exact permutation, equal to the naive global rank") {
    val got = graft.SparkEntry.queries("shuffle_deterministic")(spark, dir)
    val n = got.count()
    // positions are exactly 1..N with no gaps or repeats
    val agg = got.agg(min("pos"), max("pos"), countDistinct("pos")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n,
      s"pos not a permutation of 1..$n: $agg")
    // stitched shard rank ≡ the single-reducer row_number it replaces
    val naive = got
      .withColumn("k", md5(concat(lit("shuffle:42:"), col("doc_id").cast("string"))))
      .withColumn("expect", row_number().over(Window.orderBy(col("k"), col("doc_id"))))
    assert(naive.filter(col("pos") =!= col("expect")).count() == 0,
      "stitched rank differs from global row_number")
  }

  test("train_split: deterministic, stable under corpus growth, ≈80/10/10") {
    val assignAt = (d: String) =>
      graft.Tables.load(spark, d, "documents")
        .withColumn("h2",
          substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2))
        .withColumn("split",
          when(col("h2") < "cc", "train").when(col("h2") < "e6", "val")
            .otherwise("test"))
        .select("doc_id", "split")
    // a doc's assignment is a pure function of doc_id: growing the corpus
    // (sf0.001 → sf0.01) never reassigns a surviving doc — the property
    // that makes hash splits the standard over random ones
    val small = assignAt(dir).withColumnRenamed("split", "s1")
    val large = assignAt("/root/testdata/sf0.01").withColumnRenamed("split", "s2")
    assert(small.join(large, "doc_id").filter(col("s1") =!= col("s2")).count() == 0,
      "split assignment changed between corpus sizes")
    // realized global fractions near the designed 204/26/26 out of 256
    val fr = graft.SparkEntry.queries("train_split")(spark, dir)
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = fr.values.sum.toDouble
    assert(math.abs(fr("train") / total - 204.0 / 256) < 0.06, s"train frac ${fr("train") / total}")
    assert(math.abs(fr("val") / total - 26.0 / 256) < 0.05, s"val frac ${fr("val") / total}")
    assert(math.abs(fr("test") / total - 26.0 / 256) < 0.05, s"test frac ${fr("test") / total}")
  }

  test("dsir_weights: English (target-domain) docs score higher on average") {
    val w = graft.SparkEntry.queries("dsir_weights")(spark, dir)
      .join(graft.Tables.load(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
    val means = w.groupBy(col("lang") === "en")
      .agg(avg("dsir_logratio").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} not above non-en mean ${means(false)}")
    // target-domain mean must be positive (docs from the target look
    // more target-like than the corpus average), non-target negative
    assert(means(true) > 0, s"en mean ${means(true)} <= 0")
    assert(means(false) < 0, s"non-en mean ${means(false)} >= 0")
  }

  test("dup_ngram_ratio: bounds on the real corpus") {
    val r = graft.SparkEntry.queries("dup_ngram_ratio")(spark, dir)
    assert(r.count() > 0)
    assert(r.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    assert(r.filter(col("n_dup") > col("n_ngrams")).count() == 0)
    // the synthetic corpus plants near-dups: at least some docs share grams
    assert(r.filter(col("n_dup") > 0).count() > 0, "no shared 5-grams found at all")
  }

  test("dup_ngram_ratio: verbatim duplicate ⇒ 1.0, unique doc ⇒ 0.0, repeat-within-doc ⇒ 0.0") {
    // constructed corpus: the oracle pins corpus values; this pins the
    // DEFINITION — df counts distinct docs, so a doc's own internal
    // repetition never marks it duplicated
    val tmp = java.nio.file.Files.createTempDirectory("dupngram").toString
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "s0", 15L), // duplicated verbatim as doc 2
      (2L, "a b c d e f g h", "en", "s0", 15L),
      (3L, "p q r s t u v w", "en", "s0", 15L), // unique
      (4L, "x y x y x y x y x y", "en", "s0", 19L)) // self-repeating only
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("dup_ngram_ratio")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0, s"verbatim pair not 1.0: $got")
    assert(got(3L) == 0.0, s"unique doc not 0.0: $got")
    assert(got(4L) == 0.0, s"self-repetition counted as corpus duplication: $got")
  }

  test("source_overlap: matrix invariants on the real corpus") {
    val r = graft.SparkEntry.queries("source_overlap")(spark, dir).collect()
    assert(r.nonEmpty, "no overlapping source pairs found at all")
    r.foreach { row =>
      val (a, b) = (row.getString(0), row.getString(1))
      val (na, nb, sh) = (row.getLong(2), row.getLong(3), row.getLong(4))
      val j = row.getDouble(5)
      assert(a < b, s"pair not canonically ordered: $a, $b")
      assert(sh >= 1 && sh <= math.min(na, nb), s"shared $sh outside [1, min($na,$nb)]")
      assert(j > 0 && j <= 1, s"jaccard $j outside (0, 1]")
    }
  }

  test("source_overlap: known jaccard on a constructed corpus; disjoint pair absent") {
    // s0 = {gh(a b c d e)}; s1 = {gh(a b c d e), gh(p q r s t)};
    // s2 = {gh(v w x y z)} disjoint from both
    val tmp = java.nio.file.Files.createTempDirectory("srcov").toString
    val docs = Seq(
      (1L, "a b c d e", "en", "s0", 9L),
      (2L, "a b c d e", "en", "s1", 9L),
      (3L, "p q r s t", "en", "s1", 9L),
      (4L, "v w x y z", "en", "s2", 9L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("source_overlap")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(("s0", "s1")), s"unexpected pairs: ${got.keySet}")
    assert(got(("s0", "s1")) == ((1L, 2L, 1L, 0.5)), s"wrong overlap row: $got")
  }

  test("token_budget_plan: weights normalize, epochs ∝ 1/√share, cap flag consistent") {
    val r = graft.SparkEntry.queries("token_budget_plan")(spark, dir).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getLong(5)))
    assert(r.length > 1)
    val wsum = r.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum, not 1")
    r.foreach { case (src, n, w, alloc, epochs, cap) =>
      assert(epochs == alloc / n, s"$src: epochs $epochs != alloc/n ${alloc / n}")
      assert(cap == (if (epochs > 4.0) 1L else 0L), s"$src: over_cap $cap vs epochs $epochs")
    }
    // temperature flattening ⇒ epochs decrease as source size grows
    // (epochs ∝ 1/√n up to the 6 dp weight grid; compare well-separated ns)
    for {
      (_, na, _, _, ea, _) <- r
      (_, nb, _, _, eb, _) <- r
      if na.toDouble * 1.01 < nb.toDouble
    } assert(ea >= eb, s"epochs not monotone: n=$na e=$ea vs n=$nb e=$eb")
  }

  test("token_budget_plan: skewed corpus trips over_cap on the small source only") {
    val tmp = java.nio.file.Files.createTempDirectory("tokbud").toString
    // big source ~500 tokens, small source 5 — flattening over-allocates
    // the small one far past 4 epochs at the 2× budget
    val big = (1L to 100L).map(i => (i, "w1 w2 w3 w4 w5", "en", "sbig", 14L))
    val docs = big :+ (101L, "u1 u2 u3 u4 u5", "en", "ssmall", 14L)
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("token_budget_plan")(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getLong(5))).toMap
    assert(got("ssmall")._2 == 1L, s"small source not flagged: $got")
    assert(got("sbig")._2 == 0L, s"big source wrongly flagged: $got")
    assert(got("ssmall")._1 > got("sbig")._1)
  }

  test("gopher_rules: pass ≡ conjunction; every rule exercised or vacuous by corpus design") {
    val got = graft.SparkEntry.queries("gopher_rules")(spark, dir)
    val bad = got.filter(col("pass") =!= (col("r_count") && col("r_meanlen")
      && col("r_alpha") && col("r_symbol") && col("r_stop"))).count()
    assert(bad == 0, s"$bad rows where pass != AND(rules)")
    // the synthetic corpus is all-lowercase words with no symbols: the two
    // character-class rules are vacuously true, the other three discriminate
    val agg = got.agg(
      sum(when(col("r_alpha"), 0).otherwise(1)).as("alpha_viol"),
      sum(when(col("r_symbol"), 0).otherwise(1)).as("sym_viol"),
      countDistinct(col("r_count")).as("count_vals"),
      countDistinct(col("r_stop")).as("stop_vals")).head()
    assert(agg.getLong(0) == 0 && agg.getLong(1) == 0)
    assert(agg.getLong(2) == 2, "r_count never fires on this corpus")
    assert(agg.getLong(3) == 2, "r_stop never fires on this corpus")
  }

  test("gopher_rules: constructed violations trip exactly the intended rule") {
    val tmp = java.nio.file.Files.createTempDirectory("gopher").toString
    val normal = "the data and " + Seq.fill(27)("word").mkString(" ") // 30 words, 2 stops
    val docs = Seq(
      (1L, normal, "en", "s", 0L),                                      // passes all
      (2L, Seq.fill(30)("supercalifragilistic").mkString(" "), "en", "s", 0L), // meanlen > 10
      (3L, "the and " + Seq.fill(28)("w").mkString(" "), "en", "s", 0L), // meanlen < 3
      (4L, ("the and ### ## " + Seq.fill(26)("word").mkString(" ")), "en", "s", 0L), // 5 syms / 30 words
      (5L, Seq.fill(30)("word").mkString(" "), "en", "s", 0L),           // no stopwords
      (6L, "the and word", "en", "s", 0L))                               // 3 words < 20
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("gopher_rules")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    // (r_count, r_meanlen, r_alpha, r_symbol, r_stop, pass)
    assert(got(1L) == ((true, true, true, true, true, true)))
    assert(got(2L)._2 == false && got(2L)._6 == false, s"long words not flagged: ${got(2L)}")
    assert(got(3L)._2 == false, s"1-char words not flagged: ${got(3L)}")
    assert(got(4L)._4 == false, s"10% symbol ratio not flagged: ${got(4L)}")
    assert(got(5L)._5 == false, s"0 stopwords not flagged: ${got(5L)}")
    assert(got(6L)._1 == false, s"3-word doc not flagged: ${got(6L)}")
  }

  test("source_kl: non-negative (Gibbs), totals consistent, uniform source ⇒ ~0") {
    val got = graft.SparkEntry.queries("source_kl")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // KL ≥ 0 up to the 6dp ln grid (each ln carries ≤ 5e-7 rounding, the
    // count-weighted average keeps the bound)
    got.foreach { case (s, _, kl) => assert(kl >= -1e-5, s"$s: KL $kl < 0") }
    val corpusToks = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(got.map(_._2).sum == corpusToks, "per-source token totals don't sum to corpus")
    // constructed: a source with the corpus's own distribution scores ~0,
    // a concentrated source scores clearly positive
    val tmp = java.nio.file.Files.createTempDirectory("srckl").toString
    val mirror = (1L to 50L).map(i => (i, "a b c d", "en", "smirror", 0L))
    val skewed = (51L to 100L).map(i => (i, "a a a a", "en", "sskew", 0L))
    spark.createDataFrame(mirror ++ skewed)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val kl = graft.SparkEntry.queries("source_kl")(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("sskew") > 0.1, s"concentrated source KL too small: $kl")
    assert(kl("sskew") > kl("smirror") + 0.1, s"skewed not > mirror: $kl")
  }

  test("curriculum_schedule: permutation, strict tercile phases, stitched ≡ global rank") {
    val got = graft.SparkEntry.queries("curriculum_schedule")(spark, dir)
    val n = got.count()
    val agg = got.agg(min("pos"), max("pos"), countDistinct("pos")).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n,
      s"pos not a permutation of 1..$n: $agg")
    // every head doc trains before every middle doc before every tail doc
    val phase = got.groupBy("ppl_bucket")
      .agg(min("pos").as("lo"), max("pos").as("hi")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(phase("head")._2 < phase("middle")._1, s"head/middle overlap: $phase")
    assert(phase("middle")._2 < phase("tail")._1, s"middle/tail overlap: $phase")
    // the stitched shard rank equals the single-reducer global row_number
    val naive = got
      .withColumn("b", when(col("ppl_bucket") === "head", 0)
        .when(col("ppl_bucket") === "middle", 1).otherwise(2))
      .withColumn("k", md5(concat(lit("curriculum:42:"), col("doc_id").cast("string"))))
      .withColumn("expect", row_number().over(
        Window.orderBy(col("b"), col("k"), col("doc_id"))))
    assert(naive.filter(col("pos") =!= col("expect")).count() == 0,
      "stitched curriculum rank differs from global row_number")
  }

  test("source_centroid_sim: full matrix, bounds, and constructed identical/orthogonal sources") {
    val got = graft.SparkEntry.queries("source_centroid_sim")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    // 20 sources → C(20,2) unordered pairs, each |cos| ≤ 1, a < b ordering
    assert(got.length == 190, s"expected 190 pairs, got ${got.length}")
    got.foreach { case ((a, b), c) =>
      assert(a < b && math.abs(c) <= 1.0 + 1e-12, s"($a,$b): $c")
    }
    // constructed: s1 and s2 share the identical embedding → cos ≈ 1;
    // s3 is axis-orthogonal to both → cos exactly 0
    val tmp = java.nio.file.Files.createTempDirectory("centsim").toString
    val v1 = Array.tabulate(64)(i => if (i < 32) 0.25f else 0.0f)
    val v3 = Array.tabulate(64)(i => if (i >= 32) 0.25f else 0.0f)
    spark.createDataFrame(Seq(
        (1L, "x", "en", "s1", 1L), (2L, "x", "en", "s2", 1L), (3L, "x", "en", "s3", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.createDataFrame(Seq((1L, v1.toSeq, 0), (2L, v1.toSeq, 0), (3L, v3.toSeq, 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val m = graft.SparkEntry.queries("source_centroid_sim")(spark, tmp).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(m(("s1", "s2")) > 0.9999999, s"identical centroids: ${m(("s1", "s2"))}")
    assert(m(("s1", "s3")) == 0.0 && m(("s2", "s3")) == 0.0, s"orthogonal: $m")
  }

  test("rrf_fusion: rank bookkeeping and agreement with similarity_topk") {
    val got = graft.SparkEntry.queries("rrf_fusion")(spark, dir)
    // exactly top-10 per query, rrf strictly within (0, 2/61]
    val perQ = got.groupBy("qid").agg(count(lit(1)).as("n"),
      min("rrf_rank").as("lo"), max("rrf_rank").as("hi")).collect()
    perQ.foreach { r => assert(r.getLong(1) == 10 && r.getInt(2) == 1 && r.getInt(3) == 10) }
    val mm = got.agg(min("rrf"), max("rrf")).head()
    assert(mm.getDouble(0) > 0.0 && mm.getDouble(1) <= 2.0 / 61.0 + 1e-12)
    // every fused row came from at least one retriever's top-10
    assert(got.filter(col("cos_rank").isNull && col("l2_rank").isNull).count() == 0)
    // rrf_rank is the descending-rrf order (cid tie-break)
    val disorder = got.withColumn("expect", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf").desc, col("cid"))))
      .filter(col("rrf_rank") =!= col("expect")).count()
    assert(disorder == 0, s"$disorder rows out of rrf order")
    // the cosine leg must agree with similarity_topk's ranking verbatim
    val cosLeg = got.filter(col("cos_rank").isNotNull)
      .select(col("qid"), col("cid"), col("cos_rank"))
    val ref = graft.SparkEntry.queries("similarity_topk")(spark, dir)
      .select(col("qid"), col("cid"), col("rk"))
    assert(cosLeg.join(ref, Seq("qid", "cid"))
      .filter(col("cos_rank") =!= col("rk")).count() == 0,
      "cos_rank disagrees with similarity_topk")
    assert(cosLeg.join(ref, Seq("qid", "cid"), "left_anti").count() == 0,
      "cosine top-10 row missing from similarity_topk")
  }

  test("quality_dup_profile: conserves the dup_ngram_ratio doc set; rates recomputed exactly") {
    val prof = graft.SparkEntry.queries("quality_dup_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(prof.map(_._1).sorted.toSeq == Seq("head", "middle", "tail"))
    val dup = graft.SparkEntry.queries("dup_ngram_ratio")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every >= 5-token doc lands in exactly one tercile row
    assert(prof.map(_._2).sum == dup.length, "doc mass mismatch vs dup_ngram_ratio")
    assert(prof.map(_._3).sum == dup.map(_._2).sum, "ngram mass mismatch")
    assert(prof.map(_._4).sum == dup.map(_._3).sum, "dup mass mismatch")
    prof.foreach { case (b, _, ng, nd, rate) =>
      assert(rate == nd.toDouble / ng, s"$b rate $rate != $nd/$ng")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("shard_manifest: stitched cumsum ≡ single-window form; token mass conserved; shards contiguous") {
    val man = graft.SparkEntry.queries("shard_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(man.nonEmpty)
    // token conservation: every whitespace token lands in exactly one shard
    val corpusToks = graft.Tables.load(spark, dir, "documents")
      .agg(sum(size(split(col("text"), " ")).cast("bigint"))).head().getLong(0)
    assert(man.map(_._4).sum == corpusToks, "token mass not conserved")
    // shard ids contiguous from 0 within each source
    man.groupBy(_._1).foreach { case (src_, rows) =>
      val ids = rows.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"$src_ shard ids not contiguous: $ids")
    }
    // the stitched (source, pfx)-sharded cumsum must equal the naive
    // single-reducer per-source window it replaces — recompute the manifest
    // with the naive window and compare whole rows including the digest
    val naive = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"),
        md5(concat(lit("shard:42:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("cum", sum(col("n_toks")).over(
        Window.partitionBy("source").orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", expr("(cum - n_toks) div 128"))
      .groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("k"), col("doc_id").cast("string").as("d")))),
          x => x.getField("d")), ",")).as("manifest_md5"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(man.toSet == naive.toSet, "stitched manifest differs from the naive window form")
  }

  test("dedup_incremental: the three layers partition the new batch") {
    val inc = graft.SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(inc.nonEmpty)
    inc.foreach { case (src_, nNew, nEx, nNear, nFresh) =>
      assert(nEx + nNear + nFresh == nNew, s"$src_: layers don't partition: $nEx+$nNear+$nFresh != $nNew")
      assert(Seq(nNew, nEx, nNear, nFresh).forall(_ >= 0))
    }
    // batch size accounting: every new doc appears in exactly one source row
    val nNewTotal = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(inc.map(_._2).sum == nNewTotal)
  }

  test("source_lang_mi: bounds, and agreement with a naive double computation") {
    val r = graft.SparkEntry.queries("source_lang_mi")(spark, dir).collect().head
    val (nDocs, mi) = (r.getLong(0), r.getDouble(1))
    val cells = graft.Tables.load(spark, dir, "documents")
      .groupBy("source", "lang").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2)))
    val n = cells.map(_._2).sum
    assert(nDocs == n)
    val rSum = cells.groupBy(_._1._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val cSum = cells.groupBy(_._1._2).map { case (k, xs) => k -> xs.map(_._2).sum }
    val naive = cells.map { case ((s0, l0), o) =>
      o * math.log(o.toDouble * n / (rSum(s0).toDouble * cSum(l0)))
    }.sum / n
    // true MI >= 0 and <= ln(min(S, L)); the 6 dp term grid can shift the
    // decimal-summed value by at most 5e-7 per token
    assert(mi >= -1e-5, s"MI $mi negative beyond grid error")
    assert(mi <= math.log(math.min(rSum.size, cSum.size)) + 1e-5, s"MI $mi above channel capacity")
    assert(math.abs(mi - naive) < 1e-5, s"MI $mi != naive $naive")
  }

  test("reservoir_sample: exactly min(k, |source|) rows, deterministic, top-k pruned plan") {
    val q = graft.SparkEntry.queries("reservoir_sample")
    val df = q(spark, dir)
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perSource = graft.Tables.load(spark, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_._1)
    assert(got.keySet == perSource.keySet, "every source must be sampled")
    got.foreach { case (src, rs) =>
      assert(rs.length == math.min(10L, perSource(src)), s"$src sample size")
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"$src ranks contiguous")
    }
    // rerun-identical (the whole point of the seeded-hash reservoir)
    assert(q(spark, dir).collect().map(_.toSeq).toSeq == rows.map(r =>
      Seq(r._1, r._2, r._3)).toSeq)
    // the rank filter must compile to the WindowGroupLimit pushdown — the
    // map-side top-k prune that keeps the per-source reducer corpus-free
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=k filter did not plan as WindowGroupLimit")
  }

  test("source_jsd_matrix: full pair matrix, bounded by ln 2, naive recompute agrees") {
    val rows = graft.SparkEntry.queries("source_jsd_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val sources = docs.map(_._1).distinct.sorted
    val s = sources.length
    assert(rows.length == s * (s - 1) / 2, "one row per unordered source pair")
    rows.foreach { case (a, b, j) =>
      assert(a < b, s"($a, $b) not ordered")
      // JSD in nats is bounded by ln 2; grid rounding adds < 1e-6
      assert(j >= 0.0 && j <= 0.6931482, s"JSD($a, $b) = $j out of [0, ln 2]")
    }
    // independent naive double recompute (unrounded lns, direct p/q/m form)
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._1).map {
      case (src, ds) =>
        src -> ds.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    }
    rows.foreach { case (a, b, j) =>
      val (ca, cb) = (counts(a), counts(b))
      val (na, nb) = (ca.values.sum.toDouble, cb.values.sum.toDouble)
      val naive = (ca.keySet ++ cb.keySet).toSeq.map { t =>
        val p = ca.getOrElse(t, 0L) / na
        val q = cb.getOrElse(t, 0L) / nb
        val m = (p + q) / 2.0
        (if (p > 0) p / 2.0 * math.log(p / m) else 0.0) +
          (if (q > 0) q / 2.0 * math.log(q / m) else 0.0)
      }.sum
      assert(math.abs(j - naive) < 1e-4, s"JSD($a, $b) $j vs naive $naive")
    }
  }
}

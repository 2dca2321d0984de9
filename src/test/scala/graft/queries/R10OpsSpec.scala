package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the four operators that shipped in the round-9
  * end-of-round snapshot without replay specs (r9 verdict item 1d). The
  * DuckDB oracle pins exact values at the gate; these pin the invariants
  * that survive any corpus — full in-process replays of the integer
  * algebra plus the conservation identities each query's own comment
  * promises (Σdegree = 2·|pairs| for dup_degree_profile, the telescoping
  * near-zero identity for classical_decomposition).
  */
class R10OpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("classical_decomposition: full replay of the centered-MA integer algebra") {
    val rows = graft.SparkEntry.queries("classical_decomposition")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    // centered ROWS window over the day-ordered series, full windows only
    val devs = daily.indices.collect {
      case i if i >= 3 && i + 3 < daily.size =>
        val sum7 = (i - 3 to i + 3).map(j => daily(j)._2).sum
        val dow = daily(i)._1.getDayOfWeek.getValue.toLong - 1L // weekday(): Mon=0
        (dow, daily(i)._2 * 7 - sum7)
    }
    val expected = devs.groupBy(_._1).map { case (dow, ds) =>
      val n = ds.size.toLong
      val s = ds.map(_._2).sum
      dow -> (n, s, s.toDouble / (n * 7L).toDouble)
    }
    assert(rows == expected, "per-dow (n_days, d7_sum, seasonal_index) replay")
    // telescoping identity: Σ over dows of d7_sum = Σ(7c − sum7) over full-
    // window days — bounded by the 6 boundary rows' contribution, tiny vs
    // the raw volume scale (exact zero iff the series length ≡ 0 mod 7
    // boundary terms cancel; pin the bound, not false exactness)
    val total = expected.values.map(_._2).sum
    val volumeScale = daily.map(_._2).sum * 7
    assert(math.abs(total.toDouble) <= 0.05 * volumeScale.toDouble,
      s"seasonal deviations should telescope toward 0: Σd7=$total vs scale $volumeScale")
  }

  test("dup_degree_profile: Σ degree·n_docs = 2·|pairs| and Σ n_docs = |corpus|") {
    val hist = graft.SparkEntry.queries("dup_degree_profile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (pairs, shCache) = TextQueries.minhashPairsWithHandle(spark, dir)
    val nPairs = pairs.count()
    shCache.unpersist()
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(hist.map { case (deg, n) => deg * n }.sum == 2 * nPairs,
      "degree mass must equal twice the pair count (each pair touches 2 docs)")
    assert(hist.map(_._2).sum == nDocs,
      "histogram (incl. zero-degree remainder) must partition the corpus")
    assert(hist.map(_._1).distinct.length == hist.length, "one row per degree")
  }

  test("score_calibration: full replay of labels, score, and band identities") {
    val out = graft.SparkEntry.queries("score_calibration")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap

    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // label pass: 5-gram df ≥ 2 (gram identity, not the md5 alias)
    val grams = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length >= 5)
        (0 to toks.length - 5).map(i => (toks.slice(i, i + 5).mkString(" "), id))
      else Seq.empty
    }
    val df2 = grams.groupBy(_._1).collect { case (g, occ) if occ.map(_._2).distinct.size >= 2 => g }.toSet
    val posDocs = grams.collect { case (g, id) if df2(g) => id }.toSet
    val stop = TextQueries.stopwords.toSet
    val replayed = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toDouble
      val nStop = toks.count(stop).toDouble
      val y = math.floor((0.4 * math.min(1.0, nTok / 50.0) +
        0.3 * (1.0 - nStop / nTok) +
        0.3 * math.min(1.0, text.length.toDouble / 200.0)) * 1000000.0).toLong
      (y / 100000L, y, if (posDocs(id)) 1L else 0L)
    }
    val expected = replayed.groupBy(_._1).map { case (band, rs) =>
      val n = rs.length.toLong
      val nPos = rs.map(_._3).sum
      val sq6 = rs.map(_._2).sum
      band -> (n, nPos, nPos.toDouble / n.toDouble,
        sq6.toDouble / (n * 1000000L).toDouble, math.abs(nPos * 1000000L - sq6))
    }
    assert(out == expected, "per-band (n, n_pos, dup_rate, mean_score, gap6_num) replay")
    assert(out.values.map(_._1).sum == docs.length.toLong, "bands partition the corpus")
  }

  test("trimmed_mean_value: full replay of the cumulative-overlap trim on the cents grid") {
    val out = graft.SparkEntry.queries("trimmed_mean_value")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap

    val evs = graft.Tables.load(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))
    val expected = evs.groupBy(_._1).map { case (t, rs) =>
      val cents = rs.map(_._2).sorted
      val n = cents.length.toLong
      val k = n / 20
      val sum = cents.sum
      // the definitional trim: drop k smallest and k largest occurrences
      val window = cents.slice(k.toInt, (n - k).toInt)
      val trimmed =
        if (window.isEmpty) None
        else Some(window.sum.toDouble / (window.length.toLong * 100L).toDouble)
      t -> (n, k, sum.toDouble / (n * 100L).toDouble, trimmed)
    }
    assert(out == expected,
      "overlap-counted trim must equal the definitional sorted-slice trim")
  }
}

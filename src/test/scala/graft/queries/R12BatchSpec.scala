package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the round-12 operator batch (the R10/R11 spec
  * discipline): full in-process replays where the operator is replayable
  * from collected rows, and cross-query identities where two registry
  * queries share a construction.
  */
class R12BatchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Independent Luhn sum (1-indexed, odd positions doubled — the 16-digit
    * PAN convention with the check digit at even position 16). */
  private def luhnSum(s: String): Int =
    s.zipWithIndex.map { case (ch, i0) =>
      val d = ch - '0'
      if ((i0 + 1) % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
    }.sum

  /** The span fixture shared by safe_export_spans / pii_audit, replayed
    * with java.util.regex directly (not through Spark). r14: IP + Luhn-
    * valid/invalid card residue classes added alongside the registry's. */
  private def blurbOf(props: String, uid: Long): String = {
    val sb = new StringBuilder("note ").append(props)
    val card15 = f"$uid%015d"
    val check = (10 - luhnSum(card15) % 10) % 10
    if (uid % 3 == 0) sb.append(" user").append(uid).append("@example.com")
    if (uid % 5 == 0) sb.append(" tel +1-555-").append(f"${uid % 10000}%04d")
    if (uid % 7 == 0) sb.append(" https://ex.example/u/").append(uid)
    if (uid % 9 == 0) sb.append(" ip 10.").append(uid % 256).append(".0.").append(uid % 100)
    if (uid % 11 == 0) sb.append(" card ").append(card15).append(check)
    if (uid % 13 == 0) sb.append(" badcard ").append(card15).append((check + 5) % 10)
    sb.toString
  }
  private val UrlPat = "https?://[A-Za-z0-9./_%?=&#-]+"
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+[0-9][0-9-]{5,}[0-9]"
  private val IpPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val CardPat = "[0-9]{16}"

  test("bpe_train: full Scala replay of the 6-round greedy merge loop") {
    val out = graft.SparkEntry.queries("bpe_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.length == 6, "expected 6 merge rounds")
    // independent word-frequency dict
    var dict: Map[Vector[String], Long] = graft.Tables.load(spark, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .filter(w => w.matches("[a-z]+") && w.length >= 2)
      .groupBy(identity).view
      .map { case (w, g) => w.split("").toVector -> g.length.toLong }.toMap
    // 6 rounds of: weighted pair count -> argmax (n desc, pair asc) ->
    // greedy left-to-right non-overlapping merge
    (1 to 6).foreach { k =>
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _            =>
        }
      }
      assert(counts.nonEmpty, s"round $k: no pairs left")
      val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x + " " + y) }
      assert(out(k - 1) == ((k, s"$a $b", n)),
        s"round $k: registry ${out(k - 1)} != replay (${(k, s"$a $b", n)})")
      dict = dict.toSeq.map { case (syms, cnt) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = a + b
          else acc += x
        }
        acc.toVector -> cnt
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
  }

  test("safe_export_spans: java.util.regex replay of the sequential masking") {
    val rows = graft.SparkEntry.queries("safe_export_spans")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "props").collect()
    assert(ev.length == rows.size, "row conservation")
    var sawUrl = false; var sawEmail = false; var sawPhone = false
    var sawCard = false; var sawIp = false; var sawBadCardUnmasked = false
    ev.foreach { r =>
      val (eid, uid, props) = (r.getLong(0), r.getLong(1), r.getString(2))
      val blurb = blurbOf(props, uid)
      def countAll(s: String, p: String) = {
        val m = java.util.regex.Pattern.compile(p).matcher(s)
        var c = 0L; while (m.find()) c += 1; c
      }
      val nUrl = countAll(blurb, UrlPat)
      val m1 = blurb.replaceAll(UrlPat, "<URL>")
      val nEmail = countAll(m1, EmailPat)
      val m2 = m1.replaceAll(EmailPat, "<EMAIL>")
      val nPhone = countAll(m2, PhonePat)
      val m3 = m2.replaceAll(PhonePat, "<PHONE>")
      // card: leftmost 16-digit candidate, masked only when Luhn-valid
      // (literal replace — the invalid fixture on the same row must stay)
      val cm = java.util.regex.Pattern.compile(CardPat).matcher(m3)
      val cand = if (cm.find()) cm.group(0) else ""
      val cardOk = cand.length == 16 && luhnSum(cand) % 10 == 0
      val nCard = if (cardOk) 1L else 0L
      val m4 = if (cardOk) m3.replace(cand, "<CARD>") else m3
      val nIp = countAll(m4, IpPat)
      val m5 = m4.replaceAll(IpPat, "<IP>")
      val nDigit = m5.count(_.isDigit).toLong
      val m6 = m5.replaceAll("[0-9]", "#")
      val got = rows(eid)
      assert(got == ((m6, nUrl, nEmail, nPhone, nCard, nIp, nDigit)),
        s"event $eid replay")
      // the release contract itself: nothing PII-shaped survives the mask
      assert(countAll(m6, UrlPat) + countAll(m6, EmailPat)
        + countAll(m6, PhonePat) + countAll(m6, CardPat)
        + countAll(m6, IpPat) == 0, s"event $eid: span survived masking")
      assert(!m6.exists(_.isDigit), s"event $eid: digit survived masking")
      sawUrl ||= nUrl > 0; sawEmail ||= nEmail > 0; sawPhone ||= nPhone > 0
      sawCard ||= nCard > 0; sawIp ||= nIp > 0
      // a Luhn-INVALID candidate must be digit-scrubbed, never <CARD>-masked
      sawBadCardUnmasked ||= uid % 13 == 0 && uid % 11 != 0 && nCard == 0
    }
    assert(sawUrl && sawEmail && sawPhone && sawCard && sawIp,
      "fixture failed to exercise every class")
    assert(sawBadCardUnmasked, "fixture never exercised the Luhn-reject path")
  }

  test("pii_audit: per-type totals == safe_export_spans column sums") {
    // audit columns: n_rows, rows_email, rows_phone, rows_url, rows_card,
    // rows_ip, n_email, n_phone, n_url, n_card, n_ip, n_digit_residual,
    // rows_clean, share_clean (card/IP classes since r14)
    val audit = graft.SparkEntry.queries("pii_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((1 to 13).map(r.getLong).toVector, r.getDouble(14))).toMap
    val types = graft.Tables.load(spark, dir, "events")
      .select("event_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // span columns: n_url, n_email, n_phone, n_card, n_ip, n_digit
    val spans = graft.SparkEntry.queries("safe_export_spans")(spark, dir)
      .collect().map(r => (types(r.getLong(0)),
        (3 to 8).map(r.getLong).toVector))
    spans.groupBy(_._1).foreach { case (t, g0) =>
      val g = g0.map(_._2)
      val (counts, shareClean) = audit(t)
      val Vector(nRows, rowsEmail, rowsPhone, rowsUrl, rowsCard, rowsIp,
        nEmail, nPhone, nUrl, nCard, nIp, nDigit, rowsClean) = counts
      def col(i: Int) = g.map(_(i))
      assert(nRows == g.length, s"$t n_rows")
      assert(nUrl == col(0).sum && nEmail == col(1).sum
        && nPhone == col(2).sum && nCard == col(3).sum
        && nIp == col(4).sum && nDigit == col(5).sum,
        s"$t span totals diverge from the row-level export")
      assert(rowsUrl == col(0).count(_ > 0) && rowsEmail == col(1).count(_ > 0)
        && rowsPhone == col(2).count(_ > 0) && rowsCard == col(3).count(_ > 0)
        && rowsIp == col(4).count(_ > 0), s"$t row flags")
      val clean = g.count(_.forall(_ == 0))
      assert(rowsClean == clean, s"$t rows_clean")
      assert(shareClean == clean.toDouble / g.length.toDouble, s"$t share_clean")
    }
    assert(audit.keySet == spans.map(_._1).toSet, "type coverage")
  }

  // ---- r11 verdict item 7a: the kendall sqrt-chain cross-engine audit ----
  // tau_b's denominator is sqrt(n0-tx)*sqrt(n0-ty) over exact int64 tie
  // statistics. That is NOT reassociation-safe in the abstract —
  // sqrt(a)*sqrt(b) and sqrt(a*b) differ in the last ulp for some inputs —
  // so the cross-engine claim rests on the SHARED SPELLING: both engines
  // run int64->double cast, IEEE sqrt (a correctly-rounded basic op,
  // unlike ln/exp), and one double multiply, each bit-determined by its
  // inputs. This sweep pins (1) the Spark column == a driver-side
  // Math.sqrt replay bit-for-bit over adversarial magnitudes, and (2) at
  // least one pair where the REASSOCIATED spelling would diverge — proof
  // the spec is sharp enough to catch a future respelling.
  test("kendall denominator: sqrt-chain bit-equals Math.sqrt replay at adversarial magnitudes") {
    import spark.implicits._
    val maxN0 = (1L << 62) - 1 // n*(n-1)/2 headroom at n ~ 4.3e9 grid rows
    // (n0, tx, ty) triples: powers straddling 2^52..2^53 (the integer-exact
    // double boundary), perfect squares +/-1, primes, near-overflow, zeros
    val triples: Seq[(Long, Long, Long)] = Seq(
      (maxN0, 0L, 0L), (maxN0, maxN0 - 1, 1L),
      (maxN0, (1L << 61), (1L << 61) + 1),
      ((1L << 53) + 1, 1L, 2L), ((1L << 53) - 1, 0L, 1L),
      ((1L << 52) + 1, 0L, 0L), (4503599627370497L, 3L, 5L),
      (999999999999999989L, 999999937L, 999999893L),
      (3037000499L * 3037000499L, 1L, 0L), // isqrt(Long.Max)^2
      (225L, 0L, 0L), (226L, 1L, 2L), (2L, 1L, 1L), (1L, 0L, 0L),
      (123456789012345678L, 98765432109L, 1234567890L)
    ) ++ (0 to 40).map { i =>
      val a = (maxN0 / 41) * i + i * i + 7
      (a, a / 3, a / 7)
    }
    val got = triples.toDF("n0", "tx", "ty")
      .select(col("n0"), col("tx"), col("ty"),
        graft.queries.StatQueries.kendallDenom(col("n0"), col("tx"), col("ty")).as("denom"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
    got.foreach { case ((n0, tx, ty), denom) =>
      val ref = math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)
      assert(java.lang.Double.doubleToLongBits(denom)
        == java.lang.Double.doubleToLongBits(ref),
        s"sqrt chain diverged from Math.sqrt replay at ($n0, $tx, $ty)")
    }
    // sharpness: the reassociated spelling sqrt(a*b) is NOT the same number
    val diverging = got.exists { case ((n0, tx, ty), denom) =>
      val a = (n0 - tx).toDouble; val b = (n0 - ty).toDouble
      java.lang.Double.doubleToLongBits(denom) !=
        java.lang.Double.doubleToLongBits(math.sqrt(a * b))
    }
    assert(diverging, "expected at least one pair where sqrt(a)*sqrt(b) != sqrt(a*b)")
  }

  // ---- r11 verdict item 7b: overflow regression sweep on the widened ----
  // best_split / ab_srm paths at synthetic 1e8-row sufficient statistics.
  // The r10 fixes widened cp*(cn-cp) to DECIMAL(38,0) and moved the SRM
  // square to double; this sweep feeds the PRODUCTION expressions (shared
  // helpers, not respellings) sufficient statistics far past the old int64
  // wrap points and pins them against BigInt / strict-IEEE replays.
  test("best_split score6: DECIMAL(38,0) widening survives 1e8..1e12-row sufficient stats") {
    import spark.implicits._
    // (cp, cn, pp, nn): split sides holding ~5e7..5e11 positives — the old
    // int64 path wrapped at ~3e6 positives per side (cp*(cn-cp)*1e6 > 2^63)
    val stats: Seq[(Long, Long, Long, Long)] = Seq(
      (50000000L, 100000000L, 60000000L, 200000000L),
      (99999999L, 100000000L, 99999999L, 100000001L),
      (500000000000L, 1000000000000L, 600000000000L, 2000000000000L),
      (3000000L, 6000000L, 3000001L, 12000000L), // the ADVICE r10 wrap point
      (1L, 2L, 1L, 4L), (0L, 1L, 5L, 10L),
      (123456789L, 987654321L, 234567891L, 1987654321L))
    val got = stats.toDF("cp", "cn", "pp", "nn")
      .select(col("cp"), col("cn"), col("pp"), col("nn"),
        graft.queries.StatQueries.bestSplitScore6.as("score6"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getLong(4))) // decimal `div` yields LONG — the int64-safe doc bound
    got.foreach { case ((cp, cn, pp, nn), score6) =>
      val ref = (BigInt(cp) * (cn - cp) * 1000000) / cn +
        (BigInt(pp - cp) * ((nn - cn) - (pp - cp)) * 1000000) / (nn - cn)
      assert(BigInt(score6) == ref,
        s"score6 diverged from BigInt replay at ($cp, $cn, $pp, $nn)")
      assert(ref >= 0 && score6 >= 0, "Gini score must never go negative (wrap symptom)")
    }
  }

  test("ab_srm chi2 term: double-before-square survives a broken split at n = 1.2e8+") {
    import spark.implicits._
    // (n, o): grossly broken splits where diff ~ 256*n — the old path
    // squared the int64 diff, wrapping at n ~ 1.2e8 exactly when the gate
    // must fire
    val cells: Seq[(Long, Long)] = Seq(
      (120000000L, 120000000L), (120000000L, 0L),
      (3600000000000000L, 3600000000000000L), // n ~ 3.6e15, within the doc bound
      (1000000000L, 999999999L), (256L, 204L), (1L, 1L), (100L, 0L))
    for (w <- Seq(204L, 26L)) {
      val got = cells.toDF("n", "o")
        .select(col("n"), col("o"),
          graft.queries.SelectionQueries.srmTerm(col("o"), w).as("term"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      got.foreach { case ((n, o), term) =>
        val diff = (o * 256L - n * w).toDouble
        val ref = diff * diff / (n.toDouble * (256L * w).toDouble)
        assert(java.lang.Double.doubleToLongBits(term)
          == java.lang.Double.doubleToLongBits(ref),
          s"srm term diverged from strict-IEEE replay at (n=$n, o=$o, w=$w)")
        assert(term >= 0.0, s"chi2 term negative at (n=$n, o=$o, w=$w) - wrap symptom")
      }
      // the gate actually fires: all-in-one-cell at n = 1.2e8 must flag
      val broken = got.toMap.apply((120000000L, if (w == 204L) 120000000L else 0L))
      assert(!broken.isNaN && broken > 5.99, s"broken-split term must exceed the df=2 gate (w=$w)")
    }
  }

  // ---- r12 verdict item 4: text-side band-local ≡ exact-candidate --------
  // The claim dedup_minhash_clusters_bandlocal's oracle rests on: identical
  // band keys + identical Jaccard predicate + (verify-then-distinct ≡
  // distinct-then-verify for a deterministic predicate). Pinned directly:
  // the PAIR SETS are equal, and so are the cluster labelings.
  test("minhash band-local pairs and clusters equal the exact-candidate path") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (pe, sh) = graft.queries.TextQueries.minhashPairsWithHandle(spark, d)
      val exact = pe.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      sh.unpersist()
      val (pb, bands) = graft.queries.TextQueries.minhashPairsBandLocalWithHandle(spark, d)
      val bl = pb.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      bands.unpersist()
      assert(bl == exact, s"pair sets diverge at $d: " +
        s"only-bandlocal=${(bl -- exact).take(3)} only-exact=${(exact -- bl).take(3)}")
    }
    val a = graft.SparkEntry.queries("dedup_minhash_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = graft.SparkEntry.queries("dedup_minhash_clusters_bandlocal")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "cluster labelings diverge")
  }

  // ---- r12 operator batch: full in-process replays at sf0.001 ------------

  /** The Gopher stopword list as the spec's own copy (kept in lockstep with
    * SelectionQueries.GopherStopSql by the replays passing). */
  private val GopherStops =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-source (n, n1, m1, a) 2x2 cells replayed row-by-row in Scala. */
  private def cells2x2(d: String): Map[String, (Long, Long, Long, Long)] =
    graft.Tables.load(spark, d, "documents")
      .select("source", "n_chars", "text").collect()
      .map { r =>
        val e = if (r.getLong(1) >= 200L) 1L else 0L
        val o = if (r.getString(2).split(" ", -1).count(GopherStops) >= 2) 1L else 0L
        (r.getString(0), e, o)
      }
      .groupBy(_._1).view.map { case (src, g) =>
        src -> ((g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
          g.map(x => x._2 * x._3).sum))
      }.toMap

  test("cmh_test: BigInt replay of the stratified chi2 from raw rows") {
    val row = graft.SparkEntry.queries("cmh_test")(spark, dir).collect().head
    val cells = cells2x2(dir).values.toSeq
      .filter { case (n, n1, m1, _) => n >= 2 && n1 > 0 && n1 < n && m1 > 0 && m1 < n }
    val e6 = cells.map { case (n, n1, m1, _) => BigInt(n1) * m1 * 1000000 / n }
    val v6 = cells.map { case (n, n1, m1, _) =>
      BigInt(n1) * (n - n1) * m1 * (n - m1) * 1000000 / (BigInt(n) * n * (n - 1)) }
    val sa = cells.map(_._4).sum
    assert(row.getLong(0) == cells.length, "k_strata")
    assert(row.getLong(1) == sa, "sum_a")
    assert(BigInt(row.getLong(2)) == e6.sum, "sum_e6")
    assert(BigInt(row.getLong(3)) == v6.sum, "sum_v6")
    val diff = (BigInt(sa) * 1000000 - e6.sum).toDouble
    val ref = diff * diff / (v6.sum * 1000000).toDouble
    assert(java.lang.Double.doubleToLongBits(row.getDouble(4))
      == java.lang.Double.doubleToLongBits(ref), "chi2 bits")
    assert(row.getBoolean(5) == (ref > 3.84), "assoc_flag")
  }

  test("simpson_paradox_check: per-stratum and pooled signs replay exactly") {
    val out = graft.SparkEntry.queries("simpson_paradox_check")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          (r.getInt(5), r.getInt(6), r.getBoolean(7)))).toMap
    val cells = cells2x2(dir)
    def sgn(a: Long, n1: Long, m1: Long, n: Long): Int =
      if (n1 == 0 || n1 == n) 0
      else (BigInt(a) * (n - n1) - BigInt(m1 - a) * n1).signum
    val (pn, pn1, pm1, pa) = cells.values.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d2), (w, x, y, z)) => (a + w, b + x, c + y, d2 + z) }
    val pooled = sgn(pa, pn1, pm1, pn)
    assert(out.keySet == cells.keySet)
    out.foreach { case (src, ((n, n1, m1, a), (ds, dp, flag))) =>
      assert((n, n1, m1, a) == cells(src), s"$src cells")
      assert(ds == sgn(a, n1, m1, n), s"$src dir_source")
      assert(dp == pooled, s"$src dir_pooled")
      assert(flag == (ds * dp == -1), s"$src flag")
    }
  }

  test("hodges_lehmann_shift: brute-force pairwise-difference median replay") {
    val row = graft.SparkEntry.queries("hodges_lehmann_shift")(spark, dir)
      .collect().head
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0).substring(3).toInt < 10, r.getLong(1)))
    val g1 = docs.filter(_._1).map(_._2); val g2 = docs.filterNot(_._1).map(_._2)
    val diffs = (for (a <- g1; b <- g2) yield a - b).sorted
    val t = diffs.length
    val lo = diffs((t + 1) / 2 - 1) // 1-indexed ceil(T/2)
    val hi = diffs(t / 2) // 1-indexed T/2 + 1
    assert(row.getLong(0) == g1.length && row.getLong(1) == g2.length, "group sizes")
    assert(row.getDouble(2) == t.toDouble, "t_pairs")
    assert(row.getLong(3) == lo && row.getLong(4) == hi, s"middles: got ${row.getLong(3)},${row.getLong(4)} want $lo,$hi")
    assert(row.getDouble(5) == (lo + hi).toDouble / 2.0, "hl_shift")
  }

  test("levene_bf_test: Brown-Forsythe micro-grid replay from raw rows") {
    val row = graft.SparkEntry.queries("levene_bf_test")(spark, dir).collect().head
    val bySrc = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val per = bySrc.values.map { vs =>
      val n = vs.length
      val med = vs((n + 1) / 2 - 1) // lower median: min v with 2*cum >= n
      val z = vs.map(v => math.abs(v - med))
      val sz = z.map(BigInt(_)).sum; val qz = z.map(x => BigInt(x) * x).sum
      val ssw6 = (BigInt(n) * qz - sz * sz) * 1000000 / n
      val m6 = sz * 1000000 / n
      (BigInt(n), sz, ssw6, m6)
    }.toSeq
    val nn = per.map(_._1).sum; val szall = per.map(_._2).sum
    val m6all = szall * 1000000 / nn
    val ssb6 = per.map { case (n, _, _, m6) => n * (m6 - m6all) * (m6 - m6all) / 1000000 }.sum
    val ssw6 = per.map(_._3).sum
    val k = per.length
    assert(row.getLong(0) == k && BigInt(row.getLong(1)) == nn, "k / n")
    assert(BigInt(row.getLong(2)) == ssb6 && BigInt(row.getLong(3)) == ssw6, "ss terms")
    val f = (ssb6 * (nn - k)).toDouble / (ssw6 * (k - 1)).toDouble
    assert(java.lang.Double.doubleToLongBits(row.getDouble(4))
      == java.lang.Double.doubleToLongBits(f), "F bits")
  }

  test("t_closeness_audit: per-cell EMD replay from raw event rows") {
    val out = graft.SparkEntry.queries("t_closeness_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .selectExpr("event_type", "cast(ts as date) as d", "cast(floor(value) as long) as sens")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val nn = ev.length.toLong
    val domain = ev.map(_._3).distinct.sorted
    val span = domain.max - domain.min
    val global = ev.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val gCum = domain.scanLeft(0L)((acc, v) => acc + global(v)).tail
    val cells = ev.groupBy(e => (e._1, e._2))
    val perCell = cells.map { case ((tpe, _), rows) =>
      val k = rows.length.toLong
      val cnt = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val cCum = domain.scanLeft(0L)((acc, v) => acc + cnt.getOrElse(v, 0L)).tail
      // gap-weighted L1 between CDFs, exact integers
      val tnum = domain.init.indices.map { i =>
        val gap = domain(i + 1) - domain(i)
        (BigInt(cCum(i)) * nn - BigInt(gCum(i)) * k).abs * gap
      }.sum
      (tpe, k, tnum.toDouble / (BigInt(k) * nn * span).toDouble)
    }.toSeq
    perCell.groupBy(_._1).foreach { case (tpe, g) =>
      val (nc, maxT, cGt, rGt, share) = out(tpe)
      assert(nc == g.length, s"$tpe n_cells")
      assert(java.lang.Double.doubleToLongBits(maxT)
        == java.lang.Double.doubleToLongBits(g.map(_._3).max), s"$tpe max_t")
      assert(cGt == g.count(_._3 > 0.2), s"$tpe cells_gt02")
      assert(rGt == g.filter(_._3 > 0.2).map(_._2).sum, s"$tpe rows_gt02")
      assert(share == rGt.toDouble / g.map(_._2).sum.toDouble, s"$tpe share")
    }
  }

  test("lsh_multiprobe_topk: full Scala replay (sigs, 1-bit probes, rerank)") {
    val out = graft.SparkEntry.queries("lsh_multiprobe_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val mdf = java.security.MessageDigest.getInstance("MD5")
    def planeBit(j: Int, i: Int): Double = {
      val h = mdf.digest(s"$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
    val planes = (0 until 8).map(j => Array.tabulate(64)(i => planeBit(j, i)))
    def sig(v: Array[Float]): String = (0 until 8).map { j =>
      var acc = 0.0; var i = 0
      while (i < 64) { acc += v(i).toDouble * planes(j)(i); i += 1 }
      if (acc > 0) '1' else '0'
    }.mkString
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sigs = emb.map { case (id, v) => id -> sig(v) }.toMap
    val expected = emb.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val probes = (0 to 8).map { j =>
        if (j == 0) sigs(qid)
        else { val c = sigs(qid).toCharArray
          c(j - 1) = if (c(j - 1) == '1') '0' else '1'; new String(c) }
      }.toSet
      emb.filter { case (cid, _) => cid != qid && probes(sigs(cid)) }
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, sm) => (-sm, cid) }
        .take(10).zipWithIndex
        .map { case ((cid, sm), i) =>
          (qid, i + 1) -> ((cid, math.floor(sm * 1000000.0) / 1000000.0)) }
    }.toMap
    assert(out.keySet == expected.keySet, "rank frame keys")
    expected.foreach { case (k, (cid, sm)) =>
      assert(out(k)._1 == cid, s"$k cid")
      assert(java.lang.Double.doubleToLongBits(out(k)._2)
        == java.lang.Double.doubleToLongBits(sm), s"$k sim bits")
    }
    // the point of multiprobe: strictly more evidence than single-probe
    val single = graft.SparkEntry.queries("lsh_topk")(spark, dir).collect().length
    assert(out.size >= single, "multiprobe must never yield fewer ranked rows")
  }

  test("mcnemar_test: disagreement cells replay from the shared 2x2") {
    val out = graft.SparkEntry.queries("mcnemar_test")(spark, dir)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3), r.getBoolean(4)))).toMap
    val cells = cells2x2(dir)
    val (pn1, pm1, pa) = cells.values.foldLeft((0L, 0L, 0L)) {
      case ((x, y, z), (_, n1, m1, a)) => (x + n1, y + m1, z + a) }
    def check(key: String, n1: Long, m1: Long, a: Long): Unit = {
      val (b, c, chi2, flag) = out(key)
      assert(b == n1 - a && c == m1 - a, s"$key cells")
      if (b + c == 0) assert(chi2.isNaN && !flag, s"$key null case")
      else {
        val ref = (b - c).toDouble * (b - c).toDouble / (b + c).toDouble
        assert(java.lang.Double.doubleToLongBits(chi2)
          == java.lang.Double.doubleToLongBits(ref), s"$key chi2 bits")
        assert(flag == (ref > 3.84), s"$key flag")
      }
    }
    cells.foreach { case (src, (_, n1, m1, a)) => check(src, n1, m1, a) }
    check(null, pn1, pm1, pa)
    assert(out.size == cells.size + 1, "pooled row present")
  }

  test("cochran_q: Q statistic replays from per-doc rule flags") {
    val row = graft.SparkEntry.queries("cochran_q")(spark, dir).collect().head
    val flags = graft.Tables.load(spark, dir, "documents")
      .select("n_chars", "text").collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        val r1 = if (r.getLong(0) >= 200L) 1L else 0L
        val r2 = if (toks.count(GopherStops) >= 2) 1L else 0L
        val r3 = if (toks.length >= 20) 1L else 0L
        (r1, r2, r3)
      }
    val g1 = flags.map(_._1).sum; val g2 = flags.map(_._2).sum; val g3 = flags.map(_._3).sum
    val ls = flags.map(f => f._1 + f._2 + f._3)
    val sl = ls.sum; val sl2 = ls.map(l => l * l).sum
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) == ((flags.length.toLong, g1, g2, g3, sl, sl2)))
    val q = (BigInt(2) * (3 * (BigInt(g1) * g1 + BigInt(g2) * g2 + BigInt(g3) * g3)
      - BigInt(sl) * sl)).toDouble / (BigInt(3) * sl - sl2).toDouble
    assert(java.lang.Double.doubleToLongBits(row.getDouble(6))
      == java.lang.Double.doubleToLongBits(q), "Q bits")
    assert(row.getBoolean(7) == (q > 5.99), "flag")
  }

  test("ivf_pq_topk: ADC distances equal pq_topk's on shared pairs; probes prune") {
    val ipq = graft.SparkEntry.queries("ivf_pq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = graft.SparkEntry.queries("pq_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ipq.nonEmpty, "ivf_pq_topk returned nothing")
    // composition soundness: same codes + same ADC table => identical
    // approximate distance wherever both retrievers rank a pair
    val shared = ipq.keySet & pq.keySet
    assert(shared.nonEmpty, "no shared (qid, cid) pairs to cross-check")
    shared.foreach { k =>
      assert(java.lang.Double.doubleToLongBits(ipq(k))
        == java.lang.Double.doubleToLongBits(pq(k)),
        s"$k: ivf_pq adist ${ipq(k)} != pq_topk ${pq(k)}")
    }
    // pruning: IVF-PQ ranks a SUBSET of the corpus (probed lists), so per
    // query it can never return more rows than pq_topk's corpus-wide rank
    val perQ = ipq.keySet.groupBy(_._1).view.mapValues(_.size).toMap
    val pqQ = pq.keySet.groupBy(_._1).view.mapValues(_.size).toMap
    perQ.foreach { case (q, n) =>
      assert(n <= pqQ.getOrElse(q, 0), s"query $q: probed rank longer than corpus-wide") }
  }

  test("dbscan_clusters: roles and labels replay from dedup pair graph rules") {
    val out = graft.SparkEntry.queries("dbscan_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    // independent pair source: the band-local registry pair query runs at
    // 0.35 — restrict to >= 0.40 via its similarity column (band-local ≡
    // exact-candidate is pinned by its own spec)
    val p40 = graft.SparkEntry.queries("dedup_cosine_bandlocal")(spark, dir)
      .collect().filter(_.getDouble(2) >= 0.40)
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (p40 ++ p40.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val core = adj.filter(_._2.size >= 2).keySet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map[Long, Long]() ++ core.map(c => c -> c)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
    for (a <- core; b <- adj(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val coreLab = core.map(c => c -> find(c)).toMap
    val vecIds = out.keySet
    vecIds.foreach { v =>
      val (role, lab) = out(v)
      if (core(v)) {
        assert(role == "core" && lab == coreLab(v), s"$v core: got ($role, $lab) want ${coreLab(v)}")
      } else adj.get(v).map(_.filter(core)).filter(_.nonEmpty) match {
        case Some(coreNbrs) =>
          val want = coreNbrs.map(coreLab).min
          assert(role == "border" && lab == want, s"$v border: got ($role, $lab) want $want")
        case None =>
          assert(role == "noise" && lab == -1L, s"$v noise: got ($role, $lab)")
      }
    }
  }

  test("granger_daily: moments and F replay from raw day-grain rows") {
    val row = graft.SparkEntry.queries("granger_daily")(spark, dir).collect().head
    val daily = graft.Tables.load(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type").isin("click", "purchase"))
      .selectExpr("cast(ts as date) as d", "event_type").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val xs = daily.collect { case ((d, "click"), n) => d -> n }.toMap
    val ys = daily.collect { case ((d, "purchase"), n) => d -> n }.toMap
    val days = (xs.keySet & ys.keySet).toSeq.sorted
    val lagged = days.zip(days.drop(1)).map { case (prev, cur) =>
      (ys(cur), ys(prev), xs(prev)) } // (y, y1, x1) over the COMMON-day series
    val t = lagged.length.toLong
    def S(f: ((Long, Long, Long)) => BigInt): BigInt = lagged.map(f).sum
    val (sy, s1, sx) = (S(_._1), S(_._2), S(_._3))
    def M(sab: BigInt, sa: BigInt, sb: BigInt): Double = (t * sab - sa * sb).toDouble
    val myy = M(S(r => BigInt(r._1) * r._1), sy, sy)
    val m11 = M(S(r => BigInt(r._2) * r._2), s1, s1)
    val mxx = M(S(r => BigInt(r._3) * r._3), sx, sx)
    val m1y = M(S(r => BigInt(r._2) * r._1), s1, sy)
    val mxy = M(S(r => BigInt(r._3) * r._1), sx, sy)
    val m1x = M(S(r => BigInt(r._2) * r._3), s1, sx)
    val det2 = m11 * mxx - m1x * m1x
    val det3 = myy * det2 - m1y * (m1y * mxx - m1x * mxy) + mxy * (m1y * m1x - m11 * mxy)
    val nr = myy * m11 - m1y * m1y
    assert(row.getLong(0) == t, "t_obs")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
      java.lang.Double.doubleToLongBits(m11), "m11")
    if (t > 3 && det2 > 0 && det3 > 0) {
      val f = (t - 3).toDouble * (nr * det2 / (m11 * det3) - 1.0)
      assert(java.lang.Double.doubleToLongBits(row.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(f), "F bits")
      assert(row.getBoolean(5) == (f > 4.00), "flag")
    } else assert(row.isNullAt(4) && !row.getBoolean(5), "degenerate case")
  }

  test("theil_u_source_lang: U coefficients replay via ln6Ref from raw counts") {
    val row = graft.SparkEntry.queries("theil_u_source_lang")(spark, dir).collect().head
    val o = graft.Tables.load(spark, dir, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = o.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c = o.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = o.values.sum
    val mi6 = o.map { case ((src, lg), cnt) =>
      BigInt(cnt) * (graft.queries.LnGrid.ln6Ref(cnt, r(src))
        + graft.queries.LnGrid.ln6Ref(n, c(lg))) }.sum
    val hl6 = -c.values.map(cc => BigInt(cc) * graft.queries.LnGrid.ln6Ref(cc, n)).sum
    val hs6 = -r.values.map(rr => BigInt(rr) * graft.queries.LnGrid.ln6Ref(rr, n)).sum
    assert(row.getLong(0) == n && BigInt(row.getLong(1)) == mi6
      && BigInt(row.getLong(2)) == hl6 && BigInt(row.getLong(3)) == hs6,
      "integer sufficient statistics")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(4))
      == java.lang.Double.doubleToLongBits(mi6.toDouble / hl6.toDouble), "U(lang|source)")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(5))
      == java.lang.Double.doubleToLongBits(mi6.toDouble / hs6.toDouble), "U(source|lang)")
    // asymmetric by design: the two coefficients differ on this table
    assert(row.getDouble(4) != row.getDouble(5) || hl6 == hs6)
  }

  test("permutation_entropy: ordinal patterns and entropy replay from raw rows") {
    val row = graft.SparkEntry.queries("permutation_entropy")(spark, dir).collect().head
    val daily = graft.Tables.load(spark, dir, "events")
      .selectExpr("cast(ts as date) as d").collect()
      .map(_.getDate(0).toString).groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1).map(_._2)
    val tri = daily.sliding(3).filter(_.size == 3).toSeq
    def rank(v: Seq[Long]): Int = {
      def before(j: Int, i: Int) = v(j) < v(i) || (v(j) == v(i) && j < i)
      val r0 = (if (before(1, 0)) 1 else 0) + (if (before(2, 0)) 1 else 0)
      val r1 = (if (before(0, 1)) 1 else 0) + (if (before(2, 1)) 1 else 0)
      val r2 = (if (before(0, 2)) 1 else 0) + (if (before(1, 2)) 1 else 0)
      r0 * 9 + r1 * 3 + r2
    }
    val cnts = tri.map(rank).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = tri.length.toLong
    val h6 = -cnts.values.map(cc => BigInt(cc) * graft.queries.LnGrid.ln6Ref(cc, t)).sum
    assert(row.getLong(0) == t && row.getLong(1) == cnts.size, "t / n_patterns")
    val top = cnts.toSeq.map { case (pt, cc) => (cc, -pt) }.max
    assert(row.getInt(2) == -top._2 && row.getLong(3) == top._1, "top pattern")
    assert(BigInt(row.getLong(4)) == h6, "h6")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(5))
      == java.lang.Double.doubleToLongBits(h6.toDouble / (t * 1000000L).toDouble), "h_nats")
  }

  test("mh_odds_ratio: stratum odds terms replay in BigInt from the shared 2x2") {
    val row = graft.SparkEntry.queries("mh_odds_ratio")(spark, dir).collect().head
    val cells = cells2x2(dir).values.toSeq
    val ad6 = cells.map { case (n, n1, m1, a) =>
      BigInt(a) * (n - n1 - m1 + a) * 1000000 / n }
    val bc6 = cells.map { case (n, n1, m1, a) =>
      BigInt(n1 - a) * (m1 - a) * 1000000 / n }
    assert(row.getLong(0) == cells.length, "k_strata")
    assert(BigInt(row.getLong(1)) == ad6.sum && BigInt(row.getLong(2)) == bc6.sum,
      "stratum sums")
    if (bc6.sum == 0) assert(row.isNullAt(3))
    else assert(java.lang.Double.doubleToLongBits(row.getDouble(3))
      == java.lang.Double.doubleToLongBits(ad6.sum.toDouble / bc6.sum.toDouble), "OR bits")
  }

  test("otsu_quality_threshold: exhaustive threshold sweep replay in BigInt") {
    val row = graft.SparkEntry.queries("otsu_quality_threshold")(spark, dir).collect().head
    val stops = graft.queries.TextQueries.stopwords.toSet
    val gs = graft.Tables.load(spark, dir, "documents")
      .select("text").collect().map { r =>
        val text = r.getString(0); val toks = text.split(" ", -1)
        val q = 0.4 * math.min(1.0, toks.length.toDouble / 50.0) +
          0.3 * (1.0 - toks.count(stops).toDouble / toks.length) +
          0.3 * math.min(1.0, text.length.toDouble / 200.0)
        math.floor(q * 1000000.0).toLong / 10000L
      }
    val hist = gs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ww = gs.length.toLong; val mm = hist.map { case (g, c) => g * c }.sum
    val cands = hist.keys.toSeq.sorted.scanLeft((0L, 0L, 0L)) {
      case ((_, w0, m0), g) => (g, w0 + hist(g), m0 + g * hist(g))
    }.tail.filter(_._2 < ww).map { case (g, w0, m0) =>
      val num = BigInt(m0) * (ww - w0) - BigInt(mm - m0) * w0
      (num * num / (BigInt(w0) * (ww - w0)), g, w0, m0)
    }
    val best = cands.maxBy { case (sc, g, _, _) => (sc, -g) }
    assert(row.getLong(0) == best._2, "best_band")
    assert(row.getLong(1) == best._3 && row.getLong(2) == ww - best._3, "class sizes")
    assert(BigInt(row.getLong(5)) == best._1, "between-class score")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(3)) ==
      java.lang.Double.doubleToLongBits(best._4.toDouble / best._3.toDouble), "mean below")
  }

  test("cohen_d_length: fixed IEEE chain replays bit-exact from raw rows") {
    val row = graft.SparkEntry.queries("cohen_d_length")(spark, dir).collect().head
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0).substring(3).toInt < 10, r.getLong(1)))
    val g1 = docs.filter(_._1).map(_._2); val g2 = docs.filterNot(_._1).map(_._2)
    val (n1, n2) = (g1.length.toLong, g2.length.toLong)
    val (s1, s2) = (g1.sum, g2.sum)
    val q1 = g1.map(v => BigInt(v) * v).sum; val q2 = g2.map(v => BigInt(v) * v).sum
    val (m1, m2) = (s1.toDouble / n1.toDouble, s2.toDouble / n2.toDouble)
    val vp = ((q1.toDouble - s1.toDouble * s1.toDouble / n1.toDouble)
      + (q2.toDouble - s2.toDouble * s2.toDouble / n2.toDouble)) / (n1 + n2 - 2).toDouble
    val d = (m1 - m2) / math.sqrt(vp)
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(java.lang.Double.doubleToLongBits(row.getDouble(2))
      == java.lang.Double.doubleToLongBits(m1), "mean1 bits")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(4))
      == java.lang.Double.doubleToLongBits(vp), "pooled var bits")
    assert(java.lang.Double.doubleToLongBits(row.getDouble(5))
      == java.lang.Double.doubleToLongBits(d), "d bits")
  }
}

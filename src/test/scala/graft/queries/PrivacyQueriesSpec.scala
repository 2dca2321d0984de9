package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant tests for the privacy-release family — the DuckDB oracle pins
  * exact values at the gate; these pin the release CONTRACTS: nothing
  * identifying survives the export, and the DP noise is exactly the
  * documented seeded mechanism.
  */
class PrivacyQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("safe_export: no digits survive, n_masked exact, pseudonyms injective, hours coarsened") {
    val rows = graft.SparkEntry.queries("safe_export")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getString(3), r.getString(4), r.getInt(5)))
    val events = graft.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "ts", "props").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2), r.getString(3))).toMap
    assert(rows.length == events.size, "one export row per event")
    rows.foreach { case (id, pseudo, hour, _, masked, nMasked) =>
      val (_, ts, props) = events(id)
      // the scrub: every digit gone, span lengths preserved, audit exact
      assert(!masked.exists(_.isDigit), s"event $id: digit survived '$masked'")
      assert(masked.length == props.length, s"event $id: span lengths not preserved")
      assert(nMasked == props.count(_.isDigit), s"event $id: n_masked drift")
      assert(masked.zip(props).forall { case (m, p) => m == p || (m == '#' && p.isDigit) })
      // pseudonym shape; raw id absent from every exported string column
      assert(pseudo.length == 12 && pseudo.forall("0123456789abcdef".contains(_)))
      // hour coarsening: truncation only (never a shift past the hour)
      assert(hour.getTime <= ts.getTime && ts.getTime - hour.getTime < 3600000L)
      assert(hour.getTime % 3600000L == 0, s"event $id: hour not on the hour grid")
    }
    // salted-md5 pseudonyms are injective on this id space — a collision
    // would merge two users' activity in the release
    val users = events.values.map(_._1).toSet
    assert(rows.map(_._2).distinct.length == users.size, "pseudonym collision")
  }

  test("dp_noisy_counts: seeded Laplace replayed in-process; reproducible; mean |noise| ≈ b") {
    val q = graft.SparkEntry.queries("dp_noisy_counts")(spark, dir)
    val rows = q.collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val H = 1 << 24
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (t, d, n, noisy) =>
      // independent replay of the documented mechanism
      val hex = md.digest(s"dp:$t|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      val dev = 2 * h - H
      // the query's ln lives on LnGrid's integer grid — replay through the
      // pure-Scala reference chain (spec-pinned ≡ the SQL chain)
      val l6 = graft.queries.LnGrid.ln6Ref(math.max(H - math.abs(dev), 1), H.toLong)
      val lap6i = l6 * -2L * dev.sign
      val expect = (n * 1000000L + lap6i).toDouble / 1000000.0d
      assert(noisy == expect, s"($t, $d): noisy $noisy != replayed $expect")
    }
    // reproducible: the release can be audited run-over-run
    val again = q.collect().map(r => (r.getString(0), r.getDate(1).toString,
      r.getLong(2), r.getDouble(3)))
    assert(rows.sameElements(again), "seeded noise must be rerun-identical")
    // utility/privacy calibration: Laplace(b=2) has E|noise| = 2; with 150
    // groups the sample mean lands well inside [1, 3.2] unless the inverse
    // CDF is wrong (e.g. a missing sign or a double-counted factor of 2)
    val meanAbs = rows.map { case (_, _, n, noisy) => math.abs(noisy - n) }.sum / rows.length
    assert(meanAbs > 1.0 && meanAbs < 3.2, s"mean |noise| $meanAbs not ≈ b = 2")
  }
}

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

  /** The span fixture shared by safe_export_spans / pii_audit, replayed
    * with java.util.regex directly (not through Spark). */
  private def blurbOf(props: String, uid: Long): String = {
    val sb = new StringBuilder("note ").append(props)
    if (uid % 3 == 0) sb.append(" user").append(uid).append("@example.com")
    if (uid % 5 == 0) sb.append(" tel +1-555-").append(f"${uid % 10000}%04d")
    if (uid % 7 == 0) sb.append(" https://ex.example/u/").append(uid)
    sb.toString
  }
  private val UrlPat = "https?://[A-Za-z0-9./_%?=&#-]+"
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+[0-9][0-9-]{5,}[0-9]"

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
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val ev = graft.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "props").collect()
    assert(ev.length == rows.size, "row conservation")
    var sawUrl = false; var sawEmail = false; var sawPhone = false
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
      val nDigit = m3.count(_.isDigit).toLong
      val m4 = m3.replaceAll("[0-9]", "#")
      val got = rows(eid)
      assert(got == ((m4, nUrl, nEmail, nPhone, nDigit)), s"event $eid replay")
      // the release contract itself: nothing PII-shaped survives the mask
      assert(countAll(m4, UrlPat) + countAll(m4, EmailPat)
        + countAll(m4, PhonePat) == 0, s"event $eid: span survived masking")
      assert(!m4.exists(_.isDigit), s"event $eid: digit survived masking")
      sawUrl ||= nUrl > 0; sawEmail ||= nEmail > 0; sawPhone ||= nPhone > 0
    }
    assert(sawUrl && sawEmail && sawPhone, "fixture failed to exercise every class")
  }

  test("pii_audit: per-type totals == safe_export_spans column sums") {
    val audit = graft.SparkEntry.queries("pii_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9), r.getDouble(10))).toMap
    val types = graft.Tables.load(spark, dir, "events")
      .select("event_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val spans = graft.SparkEntry.queries("safe_export_spans")(spark, dir)
      .collect().map(r => (types(r.getLong(0)),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    spans.groupBy(_._1).foreach { case (t, g) =>
      val (nRows, rowsEmail, rowsPhone, rowsUrl, nEmail, nPhone, nUrl,
        nDigit, rowsClean, shareClean) = audit(t)
      assert(nRows == g.length, s"$t n_rows")
      assert(nUrl == g.map(_._2).sum && nEmail == g.map(_._3).sum
        && nPhone == g.map(_._4).sum && nDigit == g.map(_._5).sum,
        s"$t span totals diverge from the row-level export")
      assert(rowsUrl == g.count(_._2 > 0) && rowsEmail == g.count(_._3 > 0)
        && rowsPhone == g.count(_._4 > 0), s"$t row flags")
      val clean = g.count(x => x._2 == 0 && x._3 == 0 && x._4 == 0 && x._5 == 0)
      assert(rowsClean == clean, s"$t rows_clean")
      assert(shareClean == clean.toDouble / g.length.toDouble, s"$t share_clean")
    }
    assert(audit.keySet == spans.map(_._1).toSet, "type coverage")
  }
}

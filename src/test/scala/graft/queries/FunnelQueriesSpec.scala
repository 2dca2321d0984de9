package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic contracts for the event-grid operators — the DuckDB oracle pins
  * exact values at the gate; these pin the invariants that survive any
  * corpus: grid completeness, carry-forward causality, and conservation.
  */
class FunnelQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("resample_locf: complete grid, causal LOCF, purchase conservation") {
    val out = graft.SparkEntry.queries("resample_locf")(spark, dir)
      .select("user_id", "day", "n_purchases", "locf_value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))

    // grid completeness: every user carries every day of the corpus span
    val days = out.map(_._2).distinct.sorted
    val span = days.head.datesUntil(days.last.plusDays(1)).count()
    assert(days.size.toLong == span, s"grid has holes: ${days.size} of $span days")
    val users = out.map(_._1).distinct
    assert(out.length == users.length * days.size,
      s"${out.length} rows != ${users.length} users x ${days.size} days")

    // conservation: grid purchase counts sum to the raw purchase count
    val rawPurchases = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_._3).sum == rawPurchases)

    // causal LOCF per user: null until the first purchase day, then always
    // the most recent day-end value — recomputed here by a left fold over
    // the day-sorted rows using an independently derived day-end map
    val dayEnd = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max_by(col("value"), col("event_id")).as("v")).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), r.getDouble(2))).toMap
    out.groupBy(_._1).foreach { case (u, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(_._2.toEpochDay).foreach { case (_, day, _, locf) =>
        carry = dayEnd.get((u, day)).orElse(carry)
        assert(locf == carry, s"user $u day $day: locf $locf != expected $carry")
      }
    }
  }
}

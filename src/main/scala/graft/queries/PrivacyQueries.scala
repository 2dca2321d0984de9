package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Privacy-preserving release operators (§2.4 north-star surface, added r5).
  *
  * A training-data pipeline that exports usage reports or joins event data
  * across teams needs identifier hygiene: pseudonymize stable ids with a
  * salted hash, and SUPPRESS small groups (k-anonymity's first rule — a
  * pseudonym seen in only a handful of events is re-identifiable by its
  * activity pattern alone).
  */
object PrivacyQueries {

  /** Suppression threshold: users with fewer events than this are rolled
    * into one anonymous bucket instead of receiving a pseudonym. */
  private val K = 60

  val all: Map[String, Q] = Map(

    // ---- k-anonymous pseudonymized usage report --------------------------
    // Per-user event counts where qualifying users (≥ K events) appear under
    // a salted-md5 pseudonym and everyone else is rolled into a single
    // suppressed row (pseudo NULL, user count + event count only) — the
    // release never carries a raw user_id. Scale shape: ONE hash agg on
    // user_id (partial+final, map-side combined), then a stateless
    // projection; the suppressed roll-up aggregates the tiny per-user frame,
    // not the event stream. Deterministic: the salt is a fixed literal, the
    // pseudonym is a pure function of user_id, and the total order is
    // (pseudo NULLS FIRST, n_events).
    "pseudonymize_events" -> Q(
      fn = (s, dir) => {
        val perUser = Tables.load(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val kept = perUser.filter(col("n_events") >= K)
          .select(
            substring(md5(concat(lit("graft-2026:"), col("user_id").cast("string"))), 1, 12)
              .as("pseudo"),
            lit(1L).as("n_users"), col("n_events"))
        // agg over a possibly-empty frame still yields the one roll-up row
        // (count 0, sum NULL → 0) — matching SQL aggregate semantics exactly
        val suppressed = perUser.filter(col("n_events") < K)
          .agg(count(lit(1)).as("n_users"),
            coalesce(sum(col("n_events")), lit(0L)).as("n_events"))
          .select(lit(null).cast("string").as("pseudo"),
            col("n_users"), col("n_events"))
        kept.unionByName(suppressed)
          .orderBy(col("pseudo").asc_nulls_first, col("n_events"))
      },
      oracle = Some(
        s"""WITH pu AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
           |kept AS (
           |  SELECT substring(md5('graft-2026:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudo,
           |         CAST(1 AS BIGINT) AS n_users, n_events
           |  FROM pu WHERE n_events >= $K),
           |sup AS (
           |  SELECT CAST(NULL AS VARCHAR) AS pseudo, COUNT(*) AS n_users,
           |         CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS n_events
           |  FROM pu WHERE n_events < $K)
           |SELECT * FROM kept
           |UNION ALL
           |SELECT * FROM sup
           |ORDER BY pseudo NULLS FIRST, n_events""".stripMargin))
  )
}

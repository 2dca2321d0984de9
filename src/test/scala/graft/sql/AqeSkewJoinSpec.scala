package graft.sql

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Proof that AQE's skew-join rewrite actually fires where SkewUtils'
  * scaladoc claims it does (r9, verdict item 7): `skew_profile` diagnoses
  * hot keys and SkewUtils salts the joins AQE can't fix — but the claimed
  * boundary ("AQE handles sort-merge skew automatically when stats reveal
  * it") was documentation, not a test. This manufactures a fact-fact
  * sort-merge join with one hot key carrying ~1000× the bytes of its
  * siblings, thresholds scaled to test size, and asserts the EXECUTED
  * adaptive plan contains a SortMergeJoin with `isSkewJoin = true` — the
  * OptimizeSkewedJoin rewrite (hot partition split into advisory-sized
  * chunks, matching side replicated per chunk).
  *
  * The when-to-salt boundary this pins down: AQE's rewrite needs (a) a
  * sort-merge join, (b) runtime partition stats above
  * `skewedPartitionThresholdInBytes` and `skewedPartitionFactor` × median.
  * It does NOT fire for skewed AGGREGATION keys or for joins forced to
  * broadcast/shuffled-hash — those are SkewUtils.saltedAgg / saltedJoin
  * territory (see SkewUtils scaladoc).
  */
class AqeSkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Flatten an executed adaptive plan INCLUDING query-stage bodies:
    * QueryStageExec is a leaf (its materialized `plan` is not a child), so
    * a plain `collect` never sees the join inside a ResultQueryStage. */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p.children.flatMap(flatten) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
      case _ => Seq.empty
    }))

  test("OptimizeSkewedJoin splits the hot partition: executed plan carries isSkewJoin") {
    // hot key 0: 60k rows of incompressible 128-hex padding (~4 MB
    // post-compression in ONE reducer); 200 cold keys: 50 small rows each.
    // The pad must SURVIVE column pruning into the shuffle (hence the
    // min(length(pad)) agg below) and must not compress away (hence
    // per-row md5 content) — partition stats are compressed shuffle bytes.
    val idStr = col("id").cast("string")
    val left = spark.range(0, 60000)
      .select(lit(0L).as("k"),
        concat(md5(idStr), md5(concat(idStr, lit("a"))),
          md5(concat(idStr, lit("b"))), md5(concat(idStr, lit("c")))).as("pad"))
      .union(spark.range(0, 10000)
        .select((pmod(col("id"), lit(200)) + 1).as("k"), md5(idStr).as("pad")))
    val right = (0 to 200).flatMap(k => (0 until 5).map(i => (k.toLong, i.toLong))).toDF("k", "v")
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // the consumer must NOT require the join key's partitioning (a
      // same-key groupBy lets the rule decline the split — it would
      // re-introduce a shuffle; that case needs forceOptimizeSkewedJoin
      // or a salt, and is exactly SkewUtils.saltedAgg's territory); a
      // global agg has no distribution requirement, so the rewrite is free
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("padlen"))
      val row = joined.collect().head
      // correctness unchanged by the rewrite: every row joins 5 right rows
      assert(row.getLong(0) == (60000L + 10000L) * 5)
      assert(row.getLong(1) == 5L * (60000L * 128 + 10000L * 32))
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an AdaptiveSparkPlan root")
      val smjs = flatten(adaptive.get.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join, got:\n${adaptive.get.executedPlan}")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skewed:\n${adaptive.get.executedPlan}")
    }
  }
}

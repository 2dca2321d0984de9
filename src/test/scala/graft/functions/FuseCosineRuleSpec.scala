package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuseCosineRuleSpec extends SparkTestBase {
  import spark.implicits._

  // def, not val: Divide captures its EvalMode from the session conf at
  // parse time, so the expression must be built AFTER any ansi toggle
  private def hofCosine = {
    def dot(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    expr(s"${dot("a", "b")} / (sqrt(${dot("a", "a")}) * sqrt(${dot("b", "b")}))")
  }

  private def vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f)),
    (Array(0.3f, -0.7f, 0.1f), Array(0.3f, -0.7f, 0.1f))
  ).toDF("a", "b")

  test("the HOF cosine pattern is rewritten to the fused expression") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    // fusion is deliberately LEGACY-only: under ANSI the HOF form throws
    // DIVIDE_BY_ZERO for zero-norm vectors, which the fused loop cannot
    // replicate without changing observable semantics
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // a file source, not a local Seq: ConvertToLocalRelation would eval the
      // whole projection before the plan can be inspected
      val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
        .filter(col("vec_id") < 2)
        .crossJoin(emb.select(col("embedding").as("b")).limit(5))
      val q = pairs.select(hofCosine.as("sim"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_similarity"),
        s"expected fused expression in optimized plan:\n$optimized")
      assert(!optimized.contains("aggregate("), s"folds should be gone:\n$optimized")
      // and results equal the unfused form bit-for-bit
      val fusedVals = q.as[Double].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
      val plainVals = pairs.select(hofCosine.as("sim")).as[Double].collect().toSeq
      assert(fusedVals == plainVals)
      // sanity on the local Seq too (runs through eval, not codegen plans);
      // self-cosine is 1 ± 1ulp (dot and |a|² round independently)
      val local = vecs.select(hofCosine.as("sim")).as[Double].collect()
      assert(math.abs(local(1) - 1.0) < 1e-15)
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }

  test("ANSI-mode divisions are left unfused (divide-by-zero semantics preserved)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
        .filter(col("vec_id") < 2)
        .crossJoin(emb.select(col("embedding").as("b")).limit(3))
      val q = pairs.select(hofCosine.as("sim"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
        "ANSI divide must not be fused")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }

  test("a fold multiplying the WRONG lambda variables is not fused") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    try {
      // numerator is Σ x·x over zip_with(a, b, ...) — NOT a dot product of a and b
      def squareFold(a: String, b: String) =
        s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
      def dot(a: String, b: String) =
        s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
      val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
        .filter(col("vec_id") < 2)
        .crossJoin(emb.select(col("embedding").as("b")).limit(3))
      val q = pairs.selectExpr(
        s"${squareFold("a", "b")} / (sqrt(${dot("a", "a")}) * sqrt(${dot("b", "b")})) AS notcos")
      assert(!q.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
        "x*x fold must NOT be rewritten into a dot product")
      q.collect()
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }

  test("non-cosine divisions are left untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    try {
      val q = vecs.select(
        (expr("aggregate(a, CAST(0 AS DOUBLE), (acc, v) -> acc + v)") /
          expr("sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * 2")).as("x"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("cosine_similarity"))
      q.collect() // still executes fine
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }
}

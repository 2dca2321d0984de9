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

  test("ANSI-mode HOF cosine fuses too, with identical results (Spark 4 default)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
        .filter(col("vec_id") < 2)
        .crossJoin(emb.select(col("embedding").as("b")).limit(5))
      val q = pairs.select(hofCosine.as("sim"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("cosine_similarity"),
        s"expected ANSI fusion in optimized plan:\n$optimized")
      val fusedVals = q.as[Double].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
      val plainVals = pairs.select(hofCosine.as("sim")).as[Double].collect().toSeq
      assert(fusedVals == plainVals)
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }

  test("ANSI: zero-norm vector raises DIVIDE_BY_ZERO in fused AND unfused plans") {
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zeronorm").toString
    Seq((1, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(tmp)
    def runOnce(fuse: Boolean): Throwable = {
      if (fuse) spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosineRule
      try {
        val q = spark.read.parquet(tmp).select(hofCosine.as("sim"))
        if (fuse) {
          val opt = q.queryExecution.optimizedPlan.toString
          assert(opt.contains("cosine_similarity"), s"rule did not fire:\n$opt")
        }
        intercept[Throwable] { q.collect() }
      } finally {
        if (fuse) spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
      }
    }
    try {
      // both sides raise the same error condition (wrapped in Spark's task
      // failure chain, so walk the causes for the arithmetic root)
      def rootArithmetic(t: Throwable): Option[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .find(c => c.isInstanceOf[ArithmeticException] ||
            c.getMessage != null && c.getMessage.contains("DIVIDE_BY_ZERO"))
      val fusedErr = rootArithmetic(runOnce(fuse = true))
      val plainErr = rootArithmetic(runOnce(fuse = false))
      assert(fusedErr.isDefined, "fused plan did not raise an arithmetic error")
      assert(plainErr.isDefined, "unfused plan did not raise an arithmetic error")
      assert(fusedErr.get.getMessage.contains("DIVIDE_BY_ZERO"), fusedErr.get.getMessage)
      assert(plainErr.get.getMessage.contains("DIVIDE_BY_ZERO"), plainErr.get.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
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

  // ---- equivalence properties (fused ≡ unfused on adversarial inputs) ----

  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import org.scalacheck.rng.Seed
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StructField, StructType}
  import org.apache.spark.sql.Row

  private val floatArrayType = ArrayType(FloatType, containsNull = true)

  private val genElem: Gen[java.lang.Float] = Gen.frequency(
    8 -> Gen.choose(-2.0f, 2.0f).map(java.lang.Float.valueOf),
    2 -> Gen.const(java.lang.Float.valueOf(0.0f)),
    1 -> Gen.const(java.lang.Float.valueOf(Float.MinPositiveValue)),
    1 -> Gen.const(java.lang.Float.valueOf(Float.NaN)),
    1 -> Gen.const(java.lang.Float.valueOf(Float.PositiveInfinity)),
    1 -> Gen.const(null: java.lang.Float))

  private val genVec: Gen[Seq[java.lang.Float]] = Gen.frequency(
    1 -> Gen.const(Seq.empty[java.lang.Float]),                               // empty
    1 -> Gen.choose(1, 6).map(n => Seq.fill(n)(java.lang.Float.valueOf(0f))), // zero-norm
    6 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genElem)))

  private val genPair: Gen[(Seq[java.lang.Float], Seq[java.lang.Float])] = for {
    a <- genVec
    b <- Gen.frequency(
      3 -> Gen.listOfN(a.size, genElem),                                      // same length
      2 -> genVec,                                                            // often different length
      1 -> Gen.const(a.map(x =>
        if (x == null) null else java.lang.Float.valueOf(0f))),               // zero-norm partner
      1 -> Gen.const(a))                                                      // identical
  } yield (a, b)

  /** Reference model of the HOF formulation under LEGACY division:
    * zip_with null-pads unequal lengths, double(null)*double(y) is null, the
    * + fold propagates null, and Divide returns NULL on a divisor == 0. */
  private def hofLegacyModel(
      a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Option[Double] = {
    def fold(x: Seq[java.lang.Float], y: Seq[java.lang.Float]): Option[Double] = {
      val m = math.max(x.size, y.size)
      var acc: Option[Double] = Some(0.0)
      for (i <- 0 until m) {
        val p = if (i < x.size) Option(x(i)) else None
        val q = if (i < y.size) Option(y(i)) else None
        val prod = for (pp <- p; qq <- q) yield pp.toDouble * qq.toDouble
        acc = for (a0 <- acc; v <- prod) yield a0 + v
      }
      acc
    }
    for {
      d  <- fold(a, b)
      na <- fold(a, a)
      nb <- fold(b, b)
      denom = math.sqrt(na) * math.sqrt(nb)
      r <- if (denom == 0.0) None else Some(d / denom)
    } yield r
  }

  private def bits(v: Option[Double]): Option[Long] =
    v.map(java.lang.Double.doubleToLongBits)

  test("property: CosineSimilarity.eval ≡ HOF-legacy semantics on adversarial vectors") {
    val p = Prop.forAll(genPair) { case (a, b) =>
      val e = CosineSimilarity(
        Literal.create(a, floatArrayType), Literal.create(b, floatArrayType))
      val got = Option(e.eval(null)).map(_.asInstanceOf[Double])
      bits(got) == bits(hofLegacyModel(a, b))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  /** The ANSI model: identical to LEGACY except a zero divisor reached with
    * non-null folds THROWS (like ANSI Divide) instead of yielding NULL. */
  private def hofAnsiModel(a: Seq[java.lang.Float], b: Seq[java.lang.Float])
      : Either[String, Option[Double]] = {
    def fold(x: Seq[java.lang.Float], y: Seq[java.lang.Float]): Option[Double] = {
      val m = math.max(x.size, y.size)
      var acc: Option[Double] = Some(0.0)
      for (i <- 0 until m) {
        val p = if (i < x.size) Option(x(i)) else None
        val q = if (i < y.size) Option(y(i)) else None
        val prod = for (pp <- p; qq <- q) yield pp.toDouble * qq.toDouble
        acc = for (a0 <- acc; v <- prod) yield a0 + v
      }
      acc
    }
    (fold(a, b), fold(a, a), fold(b, b)) match {
      case (Some(d), Some(na), Some(nb)) =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) Left("DIVIDE_BY_ZERO") else Right(Some(d / denom))
      case _ => Right(None)
    }
  }

  test("property: ANSI CosineSimilarity.eval ≡ ANSI HOF semantics (throws on zero divisor)") {
    import org.apache.spark.sql.catalyst.expressions.EvalMode
    val p = Prop.forAll(genPair) { case (a, b) =>
      val e = CosineSimilarity(
        Literal.create(a, floatArrayType), Literal.create(b, floatArrayType),
        EvalMode.ANSI)
      val got =
        try Right(Option(e.eval(null)).map(_.asInstanceOf[Double]))
        catch { case ex: ArithmeticException =>
          Left(if (ex.getMessage.contains("DIVIDE_BY_ZERO")) "DIVIDE_BY_ZERO"
               else ex.getMessage) }
      (got, hofAnsiModel(a, b)) match {
        case (Left(x), Left(y))   => x == y
        case (Right(x), Right(y)) => bits(x) == bits(y)
        case _                    => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("fused plan ≡ unfused plan bit-for-bit on an adversarial batch (codegen path)") {
    val pairs = Gen.listOfN(400, genPair)
      .pureApply(Gen.Parameters.default, Seed(42L))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", floatArrayType),
      StructField("b", floatArrayType)))
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => Row(i, a, b) }
    val tmp = java.nio.file.Files.createTempDirectory("graft-cosprop").toString
    // through parquet: a file source so the rule genuinely rewrites a
    // non-local plan and the fused expression runs inside codegen
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(tmp)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      def run(fuse: Boolean): Seq[(Int, Option[Long])] = {
        if (fuse) spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ FuseCosineRule
        try {
          val q = spark.read.parquet(tmp)
            .select(col("id"), hofCosine.as("sim")).orderBy("id")
          if (fuse) {
            val opt = q.queryExecution.optimizedPlan.toString
            assert(opt.contains("cosine_similarity"), s"rule did not fire:\n$opt")
          }
          q.collect().toSeq.map(r =>
            (r.getInt(0), if (r.isNullAt(1)) None
             else Some(java.lang.Double.doubleToLongBits(r.getDouble(1)))))
        } finally {
          if (fuse) spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
        }
      }
      val fused = run(fuse = true)
      val plain = run(fuse = false)
      assert(fused.size == 400)
      fused.zip(plain).foreach { case (f, p) =>
        assert(f == p, s"fused/unfused divergence at id ${f._1}: $f vs $p")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
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

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.BucketPriorityConfig
import graft.functions.VectorFunctions.cosineSimilarity

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f))
  ).toDF("id", "a", "b")

  test("cosine_similarity matches the HOF left-fold formulation bit-exactly") {
    val hofDot =
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    def hofNorm(c: String) =
      s"sqrt(aggregate(zip_with($c, $c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    val rows = vecs.select(
      col("id"),
      cosineSimilarity(col("a"), col("b")).as("fused"),
      (expr(hofDot) / (expr(hofNorm("a")) * expr(hofNorm("b")))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: fused=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getDouble(1) == 1.0)
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(1) == 0.0)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(cosineSimilarity(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("unequal lengths and null elements yield NULL (HOF-equivalent semantics)") {
    val unequal = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f)))
      .toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b"))).collect()(0)
    assert(unequal.isNullAt(0))
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b"))).collect()(0)
    assert(withNullElem.isNullAt(0))
  }

  test("FloatVectorDot == the HOF left-fold bit-for-bit (codegen path, real data)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
    def hofDot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val rows = emb.select(
      col("vec_id"),
      VectorFunctions.floatDot(col("embedding"), col("embedding")).as("fast"),
      hofDot("embedding", "embedding").as("hof")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: fast=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
    // HOF null semantics: unequal lengths and null elements => NULL
    val unequal = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b").select(VectorFunctions.floatDot(col("a"), col("b"))).collect()(0)
    assert(unequal.isNullAt(0))
    val nullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b").select(VectorFunctions.floatDot(col("a"), col("b"))).collect()(0)
    assert(nullElem.isNullAt(0))
  }

  test("FloatVectorL2Sq == the HOF left-fold bit-for-bit (codegen path, real data)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
    // sliced subvectors, exactly how pq_topk drives it
    val pairs = emb.select(
      expr("slice(embedding, 1, 8)").as("a"),
      expr("slice(embedding, 9, 8)").as("b"))
    def hofL2(a: String, b: String) = expr(
      s"""aggregate(zip_with($a, $b,
         |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    val rows = pairs.select(
      VectorFunctions.floatL2Sq(col("a"), col("b")).as("fast"),
      hofL2("a", "b").as("hof")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    val unequal = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b").select(VectorFunctions.floatL2Sq(col("a"), col("b"))).collect()(0)
    assert(unequal.isNullAt(0))
    val nullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b").select(VectorFunctions.floatL2Sq(col("a"), col("b"))).collect()(0)
    assert(nullElem.isNullAt(0))
  }

  test("VectorL2Sq: mixed float/double arrays == HOF fold; float/float == FloatVectorL2Sq") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
    // the kmeans_train shape: float data vs double centroids
    val pairs = emb.select(
      col("embedding").as("a"),
      expr("transform(reverse(embedding), x -> CAST(x AS DOUBLE))").as("bd"),
      expr("reverse(embedding)").as("bf"))
    val rows = pairs.select(
      VectorFunctions.l2Sq(col("a"), col("bd")).as("mixed"),
      expr("""aggregate(zip_with(a, bd,
          |  (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("hof"),
      VectorFunctions.l2Sq(col("a"), col("bf")).as("ff"),
      VectorFunctions.floatL2Sq(col("a"), col("bf")).as("legacy")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"mixed=${r.getDouble(0)} hof=${r.getDouble(1)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"ff=${r.getDouble(2)} legacy=${r.getDouble(3)}")
    }
    // double/double and null semantics
    val dd = Seq((Seq(1.0, 2.0), Seq(3.0, 1.0)))
      .toDF("a", "b").select(VectorFunctions.l2Sq(col("a"), col("b"))).collect()(0)
    assert(dd.getDouble(0) == 5.0)
    val unequal = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b").select(VectorFunctions.l2Sq(col("a"), col("b"))).collect()(0)
    assert(unequal.isNullAt(0))
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b").select(VectorFunctions.l2Sq(col("a"), col("b"))).collect()(0)
    assert(nullElem.isNullAt(0))
  }

  test("property: FloatVectorL2Sq.eval ≡ HOF left-fold semantics on adversarial vectors") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val floatArrayType = ArrayType(FloatType, containsNull = true)
    val genElem: Gen[java.lang.Float] = Gen.frequency(
      8 -> Gen.choose(-2.0f, 2.0f).map(java.lang.Float.valueOf),
      2 -> Gen.const(java.lang.Float.valueOf(0.0f)),
      1 -> Gen.const(java.lang.Float.valueOf(Float.MinPositiveValue)),
      1 -> Gen.const(java.lang.Float.valueOf(Float.NaN)),
      1 -> Gen.const(java.lang.Float.valueOf(Float.PositiveInfinity)),
      1 -> Gen.const(null: java.lang.Float))
    val genVec: Gen[Seq[java.lang.Float]] =
      Gen.frequency(
        1 -> Gen.const(Seq.empty[java.lang.Float]),
        6 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genElem)))
    val genPair = for {
      a <- genVec
      b <- Gen.frequency(
        3 -> Gen.listOfN(a.size, genElem), // same length
        2 -> genVec,                       // often different length
        1 -> Gen.const(a))                 // identical (distance 0)
    } yield (a, b)
    // HOF model: zip_with null-pads unequal lengths, (null − y)² is null,
    // the + fold propagates null
    def model(a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Option[Double] = {
      val m = math.max(a.size, b.size)
      var acc: Option[Double] = Some(0.0)
      for (i <- 0 until m) {
        val p = if (i < a.size) Option(a(i)) else None
        val q = if (i < b.size) Option(b(i)) else None
        val sq = for (pp <- p; qq <- q) yield {
          val d = pp.toDouble - qq.toDouble; d * d
        }
        acc = for (a0 <- acc; v <- sq) yield a0 + v
      }
      acc
    }
    def bits(v: Option[Double]) = v.map(java.lang.Double.doubleToLongBits)
    val p = Prop.forAll(genPair) { case (a, b) =>
      val e = FloatVectorL2Sq(
        Literal.create(a, floatArrayType), Literal.create(b, floatArrayType))
      bits(Option(e.eval(null)).map(_.asInstanceOf[Double])) == bits(model(a, b))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("SQL registration: cosine_similarity and bucket_of usable from spark.sql") {
    val cfg = BucketPriorityConfig("t", Seq("Platinum", "Gold"), Seq(70, 30)).toOption.get
    BucketSqlFunctions.registerAll(spark, cfg)
    vecs.createOrReplaceTempView("vecs_sql_test")
    val sim = spark.sql(
      "SELECT cosine_similarity(a, b) AS s FROM vecs_sql_test WHERE id = 1")
      .as[Double].collect()(0)
    assert(sim == 1.0)
    val b = spark.sql("SELECT bucket_of('Platinum-001') AS b").collect()(0).getString(0)
    assert(b == "Platinum")
    val none = spark.sql("SELECT bucket_of('Silver-001') AS b").collect()(0)
    assert(none.isNullAt(0))
  }
}

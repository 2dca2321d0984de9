package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SimhashFingerprint]] must be bit-for-bit the round-1 explode + md5 +
  * vote-sum-agg formulation it replaced (which is also what the DuckDB
  * oracle CTE still computes). */
class SimhashFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  /** The old pipeline, inlined as the reference model: one row per shingle,
    * md5, per-hex-char ±1 votes, bit i set iff vote sum > 0. */
  private def modelFingerprint(shingles: Seq[String]): Long = {
    val votes = new Array[Int](32)
    shingles.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 32).foreach(i => votes(i) += (if (hex.charAt(i) >= '8') 1 else -1))
    }
    (0 until 32).foldLeft(0L)((fp, i) => if (votes(i) > 0) fp | (1L << (31 - i)) else fp)
  }

  test("fingerprint == explode+vote-agg model on varied shingle sets") {
    val cases: Seq[Seq[String]] = Seq(
      Seq("a b c"),
      Seq("a b c", "b c d", "c d e"),
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      (1 to 97).map(i => s"tok$i tok${i + 1} tok${i + 2}"),
      Seq("", " ", "unicode ✓ shingle")
    )
    val got = cases.toDF("shingles")
      .select(SimhashFunctions.simhashFingerprint(col("shingles")).as("fp"))
      .as[Long].collect().toSeq
    assert(got == cases.map(modelFingerprint))
  }

  test("interpreted eval (Expression.eval, incl. null mapping) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // Expression.eval → nullSafeEval: the path constant folding and
    // fallback-mode evaluation use (the DataFrame tests above run codegen)
    val shingles = Seq("x y z", "y z w")
    val e = SimhashFingerprint(Literal.create(shingles, ArrayType(StringType)))
    assert(e.eval(null) == modelFingerprint(shingles))
    val withNull = SimhashFingerprint(
      Literal.create(Seq("a", null, "b"), ArrayType(StringType, containsNull = true)))
    assert(withNull.eval(null) == null) // the fp < 0 → NULL mapping
    val nullArr = SimhashFingerprint(Literal.create(null, ArrayType(StringType)))
    assert(nullArr.eval(null) == null)
  }

  test("null semantics: null array -> null; null element -> null; empty -> 0") {
    val df = Seq(
      (1, Seq("a b c")),
      (2, null.asInstanceOf[Seq[String]]),
      (3, Seq.empty[String])
    ).toDF("id", "shingles")
      .withColumn("fp", SimhashFunctions.simhashFingerprint(col("shingles")))
    val rows = df.orderBy("id").select("fp").collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0L)
    val withNullElem = Seq(Tuple1(Seq("a", null, "b"))).toDF("shingles")
      .select(SimhashFunctions.simhashFingerprint(col("shingles")).as("fp"))
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("rejects non-array<string> input at analysis time") {
    val ex = intercept[Exception] {
      Seq(Tuple1(Seq(1, 2))).toDF("xs")
        .select(SimhashFunctions.simhashFingerprint(col("xs"))).collect()
    }
    assert(ex.getMessage.contains("array<string>") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}

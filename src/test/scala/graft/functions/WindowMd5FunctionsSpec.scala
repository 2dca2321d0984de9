package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MinWindowMd5]] must match the HOF formulation it replaced
  * (`array_min(transform(sequence(...), i -> md5(array_join(slice(...)))))`,
  * which the DuckDB oracle still computes). */
class WindowMd5FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def model(toks: Seq[String], w: Int): String =
    (0 to toks.length - w).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(toks.slice(i, i + w).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.min

  test("min-window md5 == HOF model, including against Spark's own HOF") {
    val cases = Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("a", "b", "c", "d", "e", "f", "g"),
      (1 to 300).map(i => s"tok${i % 13}"),
      Seq("", "x", "", "y", "z", "")
    )
    val df = cases.toDF("toks")
    val got = df.select(WindowMd5Functions.minWindowMd5(col("toks"), 5).as("fp"))
      .as[String].collect().toSeq
    assert(got == cases.map(model(_, 5)))
    // and against the exact HOF expression this replaced
    val hof = df.select(expr(
      "array_min(transform(sequence(0, size(toks) - 5), i -> md5(array_join(slice(toks, i + 1, 5), ' '))))")
      .as("fp")).as[String].collect().toSeq
    assert(got == hof)
  }

  test("winnow fingerprints == the two-layer HOF model (set + order semantics)") {
    // scala model of array_distinct(transform(windows, j -> min(slice(hs, j, w))))
    def winnowModel(toks: Seq[String], k: Int, w: Int): Seq[String] = {
      val hs = (0 to toks.length - k).map { i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      (0 to hs.length - w).map(j => hs.slice(j, j + w).min).distinct
    }
    val cases = Seq(
      Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      (1 to 100).map(i => s"tok${i % 7}"),
      (1 to 40).map(i => s"w$i"))
    val df = cases.toDF("toks")
    val got = df.select(WindowMd5Functions.winnowFingerprints(col("toks"), 5, 4).as("fps"))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(winnowModel(_, 5, 4)))
    // against Spark's own HOF on a SMALL frame (the HOF form is quadratic
    // after projection collapse — fine at this size, the expression is the
    // production path)
    val hof = df
      .withColumn("hs", expr(
        "transform(sequence(0, size(toks) - 5), i -> md5(array_join(slice(toks, i + 1, 5), ' ')))"))
      .select(expr(
        "array_distinct(transform(sequence(0, size(hs) - 4), j -> array_min(slice(hs, j + 1, 4))))")
        .as("fps")).as[Seq[String]].collect().toSeq
    assert(got == hof)
    // guarantee: two docs sharing an 8-token run share >= 1 fingerprint
    val shared = (1 to 8).map(i => s"run$i")
    val d1 = (1 to 20).map(i => s"a$i") ++ shared ++ (1 to 5).map(i => s"b$i")
    val d2 = (1 to 11).map(i => s"c$i") ++ shared
    val fps = Seq(d1, d2).toDF("toks")
      .select(WindowMd5Functions.winnowFingerprints(col("toks"), 5, 4).as("fps"))
      .as[Seq[String]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
    // null semantics
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    assert(WinnowFingerprints(
      Literal.create(Seq("a", "b", "c"), ArrayType(StringType)), 5, 4).eval(null) == null)
    assert(WinnowFingerprints(
      Literal.create(null, ArrayType(StringType)), 5, 4).eval(null) == null)
  }

  test("interpreted eval + null semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val toks = Seq("a", "b", "c", "d", "e", "f")
    assert(MinWindowMd5(Literal.create(toks, ArrayType(StringType)), 5).eval(null).toString
      == model(toks, 5))
    // too few tokens, null array, null element -> NULL
    assert(MinWindowMd5(Literal.create(Seq("a"), ArrayType(StringType)), 5).eval(null) == null)
    assert(MinWindowMd5(Literal.create(null, ArrayType(StringType)), 5).eval(null) == null)
    assert(MinWindowMd5(Literal.create(Seq("a", null, "b", "c", "d", "e"),
      ArrayType(StringType, containsNull = true)), 5).eval(null) == null)
  }
}

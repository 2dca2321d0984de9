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

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[ShingleSet]] must be element-for-element (values AND order) the
  * array_distinct + transform + array_join HOF chain it replaced — the
  * construction the DuckDB oracles still compute. */
class ShingleFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hof(w: Int) = expr(
    s"array_distinct(transform(sequence(0, size(toks) - $w), i -> array_join(slice(toks, i + 1, $w), ' ')))")

  test("native == HOF chain on the real corpus, widths 3 and 5") {
    val toks = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("toks", split(col("text"), " "))
    Seq(3, 5).foreach { w =>
      val both = toks.filter(size(col("toks")) >= w)
        .select(hof(w).as("expect"),
          ShingleFunctions.shingleSet(col("toks"), w).as("got"))
        .as[(Seq[String], Seq[String])].collect()
      assert(both.nonEmpty)
      both.foreach { case (e, g) =>
        assert(g == e, s"width $w: native shingles diverge from the HOF form")
      }
    }
  }

  test("constructed edges: duplicate windows, empty-string tokens, unicode, order") {
    val cases = Seq(
      Seq("a", "b", "c"),                     // single window
      Seq("a", "b", "a", "b", "a", "b"),      // duplicate shingles -> distinct
      Seq("", "x", "", "x", ""),              // empty-string tokens are tokens
      Seq("✓", "naïve", "τ", "✓", "naïve"),   // multi-byte UTF-8
      (1 to 40).map(i => s"t${i % 7}")        // heavy duplication, order matters
    )
    val both = cases.toDF("toks")
      .select(hof(3).as("expect"), ShingleFunctions.shingleSet(col("toks")).as("got"))
      .as[(Seq[String], Seq[String])].collect()
    both.zip(cases).foreach { case ((e, g), c) =>
      assert(g == e, s"case $c: $g != $e")
    }
  }

  test("null semantics: null array, null element, and short arrays are NULL") {
    val df = Seq(
      (1, Seq("a", "b", "c")),
      (2, null.asInstanceOf[Seq[String]]),
      (3, Seq("a", "b")), // < width: HOF never evaluated here (guarded)
      (4, Seq("a", null, "b", "c"))
    ).toDF("id", "toks")
      .withColumn("sh", ShingleFunctions.shingleSet(col("toks")))
      .orderBy("id").select("sh").collect()
    assert(!df(0).isNullAt(0))
    assert(df(1).isNullAt(0) && df(2).isNullAt(0) && df(3).isNullAt(0))
  }

  test("interpreted eval (Expression.eval) agrees") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val toks = Seq("a", "b", "c", "a", "b", "c")
    val e = ShingleSet(Literal.create(toks, ArrayType(StringType)), 3)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until got.numElements()).map(got.getUTF8String(_).toString)
      == Seq("a b c", "b c a", "c a b"))
  }
}

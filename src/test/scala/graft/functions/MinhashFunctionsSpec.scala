package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MinhashSignature]] must be byte-for-byte the explode + md5 + min-agg
  * formulation it replaced (what the DuckDB oracle still computes). */
class MinhashFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def modelSignature(shingles: Seq[String]): Seq[String] = {
    val hexes = shingles.map(s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    (0 until MinhashUtil.NumHashes).map(k => hexes.map(_.substring(4 * k, 4 * k + 4)).min)
  }

  test("signature == explode+min-agg model on varied shingle sets") {
    val cases: Seq[Seq[String]] = Seq(
      Seq("a b c"),
      Seq("a b c", "b c d", "c d e"),
      (1 to 211).map(i => s"tok$i tok${i + 1} tok${i + 2}"),
      Seq("", " ", "unicode ✓ shingle")
    )
    val got = cases.toDF("shingles")
      .select(MinhashFunctions.minhashSignature(col("shingles")).as("sigs"))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(modelSignature))
  }

  test("interpreted eval (Expression.eval) agrees with the model") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val shingles = Seq("x y z", "y z w", "z w v")
    val e = MinhashSignature(Literal.create(shingles, ArrayType(StringType)))
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until MinhashUtil.NumHashes).map(got.getUTF8String(_).toString)
      == modelSignature(shingles))
    assert(MinhashSignature(Literal.create(Seq.empty[String], ArrayType(StringType)))
      .eval(null) == null)
  }

  test("null semantics: null array, null element, and empty array are all NULL") {
    val df = Seq(
      (1, Seq("a b c")),
      (2, null.asInstanceOf[Seq[String]]),
      (3, Seq.empty[String]),
      (4, Seq("a", null, "b"))
    ).toDF("id", "shingles")
      .withColumn("sigs", MinhashFunctions.minhashSignature(col("shingles")))
      .orderBy("id").select("sigs").collect()
    assert(!df(0).isNullAt(0))
    assert(df(1).isNullAt(0) && df(2).isNullAt(0) && df(3).isNullAt(0))
  }
}

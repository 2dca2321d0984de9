package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Contracts for [[RollingWindowHashes]] — the Rabin-Karp production path
  * for dedup_substrings (r10, the swap its r9 Scale-shape note promised).
  * The gram IDENTITY differs from the md5 form by design; what must not
  * differ is the duplicated-position geometry the query derives from it.
  */
class RollingHashSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def fp(toks: Seq[String], width: Int): Option[Seq[Seq[Byte]]] = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(toks.map(t =>
      if (t == null) null else UTF8String.fromString(t)).toArray[Any])
    Option(WindowMd5Util.rollingWindowHashes(arr, width))
      .map(_.toObjectArray(org.apache.spark.sql.types.BinaryType)
        .map(_.asInstanceOf[Array[Byte]].toSeq).toSeq)
  }

  test("rolling update equals direct per-window recompute") {
    val toks = Seq("alpha", "beta", "gamma", "beta", "alpha", "delta", "beta", "x")
    val w = 3
    val rolled = fp(toks, w).get
    // direct recompute: each window hashed from scratch IS the rolled value
    val direct = (0 to toks.length - w).map(i => fp(toks.slice(i, i + w), w).get.head)
    assert(rolled == direct, "rolling recurrence must match from-scratch window hashes")
    assert(rolled.size == toks.length - w + 1)
  }

  test("equal windows collide, unequal windows don't (fixture scale)") {
    val toks = Seq("a", "b", "c", "d", "a", "b", "c", "e", "a", "b", "c", "d")
    val h = fp(toks, 3).get
    assert(h(0) == h(4) && h(0) == h(8),
      "identical 3-token windows must fingerprint equally")
    assert(h(0) == fp(Seq("a", "b", "c"), 3).get.head, "cross-doc identity")
    assert(h(0) != h(1), "'a b c' vs 'b c d'")
    assert(h(1) != h(5), "'b c d' vs 'b c e'")
    // token boundaries are inherent: ("ab","c") must differ from ("a","bc")
    assert(fp(Seq("ab", "c"), 2).get.head != fp(Seq("a", "bc"), 2).get.head)
    assert(fp(Seq("a", "", "b"), 3).get.head != fp(Seq("a", "b", ""), 3).get.head)
  }

  test("null semantics mirror MinWindowMd5: short input and null tokens → null") {
    assert(fp(Seq("a", "b"), 3).isEmpty)
    assert(fp(Seq("a", null, "b", "c"), 2).isEmpty)
    assert(fp(Seq.empty, 1).isEmpty)
    assert(fp(Seq("only"), 1).get.size == 1)
  }

  test("width-5 df≥2 label sets ≡ the md5 form's (the gram-label consumers' contract)") {
    // dup_ngram_ratio / auc_dup_quality / score_calibration /
    // isotonic_calibration / source_overlap all key on "5-token window
    // duplicated across ≥2 docs" — the r10 swap changes the gram IDENTITY
    // to the rolling fingerprint; the per-doc label and per-gram df sets
    // must not move
    val base = graft.Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
    def labels(grams: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val tf = grams.groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
      val df = tf.groupBy("gh").agg(count(lit(1)).as("df"))
      tf.join(df, Seq("gh")).groupBy("doc_id")
        .agg(max(when(col("df") >= 2, 1L).otherwise(0L)).as("pos"),
          sum(when(col("df") >= 2, col("c")).otherwise(0L)).as("n_dup"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1) * 1000000L + r.getLong(2))).toMap
    }
    val md5L = labels(base.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(toks) - 5), i -> md5(array_join(slice(toks, i + 1, 5), ' ')))"))
      .as("gh")))
    val rollL = labels(base.select(col("doc_id"),
      explode(WindowMd5Functions.rollingWindowHashes(col("toks"), 5)).as("gh")))
    assert(md5L == rollL, "per-doc (pos, n_dup) must be hash-identity-independent")
    assert(md5L.values.exists(_ >= 1000000L), "fixture must contain dup labels")
  }

  test("duplicated-position sets ≡ the md5 form's on the gate corpus") {
    // the md5 form dedup_substrings shipped with (r9) vs the rolling form
    // it runs now: positions whose 50-token window is duplicated across
    // ≥2 docs must be IDENTICAL sets — the only thing the query keeps
    def dupPositions(gramCol: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val dup = gramCol.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("gh")
      gramCol.join(dup, Seq("gh")).select("doc_id", "p")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val base = graft.Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 50)
    val md5Grams = base
      .select(col("doc_id"), explode(expr("sequence(1, size(toks) - 49)")).as("p"), col("toks"))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        expr("md5(array_join(slice(toks, int(p), 50), ' '))").as("gh"))
    val rollGrams = base
      .select(col("doc_id"),
        posexplode(WindowMd5Functions.rollingWindowHashes(col("toks"), 50)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("gh"))
    val md5Set = dupPositions(md5Grams)
    val rollSet = dupPositions(rollGrams)
    assert(md5Set == rollSet,
      s"duplicated-position sets diverged: md5-only=${(md5Set -- rollSet).size} " +
        s"roll-only=${(rollSet -- md5Set).size}")
    assert(md5Set.nonEmpty, "fixture corpus must actually contain duplicated substrings")
  }
}

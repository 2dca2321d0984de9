package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the simhash pipeline (not part of the
  * benchmark contract; run manually while optimizing). */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("simhash-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"[prof] $name run$i ${(System.nanoTime() - t0) / 1e6}%.0f ms")
        spark.catalog.clearCache()
      }
    }

    val shinglesExpr =
      "array_distinct(transform(sequence(0, size(toks) - 3), i -> array_join(slice(toks, i + 1, 3), ' ')))"
    def base = Tables.load(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", expr(shinglesExpr))
    time("scan+shingles")(base.select("doc_id", "shingles"))
    def exploded = base.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("explode")(exploded)
    time("explode+md5")(exploded.withColumn("h", md5(col("sh"))))
    def convd = exploded.withColumn("h", md5(col("sh")))
      .select(col("doc_id") +: (0 until 4).map(c =>
        expr(s"cast(conv(substring(h, ${8 * c + 1}, 8), 16, 10) as bigint)").as(s"c$c")): _*)
    time("explode+md5+conv")(convd)
    def agged = convd.groupBy("doc_id").agg(
      count(lit(1)).as("n_sh"),
      (1 to 32).map { i =>
        val c = (i - 1) / 8; val p = (i - 1) % 8; val shift = (7 - p) * 4 + 3
        sum(shiftright(col(s"c$c"), shift).bitwiseAND(1)).as(s"s$i")
      }: _*)
    time("full agg")(agged)

    // variant A: packed-lane agg — spread the 8 nibble-top bits of each
    // 32-bit chunk into byte lanes of a long, then 4 sums instead of 32;
    // decode counts with shift+mask after the agg
    def spread(c: org.apache.spark.sql.Column) =
      (0 until 8).map(k => shiftleft(shiftright(c, 4 * k + 3).bitwiseAND(1), 8 * k))
        .reduce((a, b) => a.bitwiseOR(b))
    def aggedPacked = convd.groupBy("doc_id").agg(
      count(lit(1)).as("n_sh"),
      (0 until 4).map(c => sum(spread(col(s"c$c"))).as(s"p$c")): _*)
    def fpPacked = aggedPacked.select(col("doc_id"),
      concat((1 to 32).map { i =>
        val c = (i - 1) / 8; val p = (i - 1) % 8
        val cnt = shiftright(col(s"p$c"), 8 * (7 - p)).bitwiseAND(255)
        when(cnt * 2 > col("n_sh"), "1").otherwise("0")
      }: _*).as("simhash"))
    time("packed agg")(fpPacked)

    // variant B: no explode, no shuffle — per-doc HOF aggregate over the
    // shingle array with a 4-long packed accumulator
    def chunkOf(h: String, c: Int) =
      s"cast(conv(substring($h, ${8 * c + 1}, 8), 16, 10) as bigint)"
    def spreadSql(v: String) =
      (0 until 8).map(k =>
        s"shiftleft(shiftright($v, ${4 * k + 3}) & 1, ${8 * k})").mkString(" | ")
    def hofFp = base.select(col("doc_id"),
      expr("transform(shingles, s -> md5(s))").as("hs"),
      size(col("shingles")).as("n_sh"))
      .select(col("doc_id"), col("n_sh"),
        expr(s"""aggregate(hs, array(bigint(0), bigint(0), bigint(0), bigint(0)),
                 (acc, h) -> array(${(0 until 4).map(c =>
                   s"acc[$c] + (${spreadSql(chunkOf("h", c))})").mkString(", ")}))""")
          .as("packs"))
      .select(col("doc_id"),
        concat((1 to 32).map { i =>
          val c = (i - 1) / 8; val p = (i - 1) % 8
          val cnt = shiftright(expr(s"packs[$c]"), 8 * (7 - p)).bitwiseAND(255)
          when(cnt * 2 > col("n_sh"), "1").otherwise("0")
        }: _*).as("simhash"))
    time("hof no-shuffle")(hofFp)

    // variant C (SHIPPED, round 4): the native SimhashFingerprint
    // expression — whole-doc vote loop in one codegen'd call, no explode,
    // no shuffle. The winner over the explode+agg pipeline above (~3×) and
    // over both rejected variants.
    def nativeFp = base.select(col("doc_id"),
      graft.functions.SimhashFunctions.simhashFingerprint(col("shingles")).as("fp"))
    time("native expression")(nativeFp)

    (1 to 2).foreach { _ =>
      time("simhash_fingerprint query")(SparkEntry.queries("simhash_fingerprint")(spark, dir))
      time("simhash_pairs query")(SparkEntry.queries("simhash_pairs")(spark, dir))
    }
    spark.stop()
  }
}

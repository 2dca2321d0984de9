package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated corpus (/root/repo/TESTDATA.md).
  * One parquet file per table under the given scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as two physical parquet types across corpus
    // generations; normalize both to a session-zone TimestampType so every
    // downstream query (unix_micros, watermarks, Row.getTimestamp) sees one
    // type:
    //  - TIMESTAMP(NANOS): no native Spark type — read as epoch nanos
    //    (nanosAsLong) and convert; the corpus carries whole microseconds,
    //    so `div 1000` is lossless.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    //    TIMESTAMP_NTZ — cast to TimestampType. The session timezone is
    //    pinned to UTC everywhere (SparkEntry/Verify/Bench/tests), so the
    //    cast reinterprets the wall-clock value as the same UTC instant
    //    DuckDB sees, bit-for-bit.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  // last (session, sfDir) registered — avoids re-reading 10 parquet footers
  // on every spark.sql-based query in a Verify/Bench run
  private val lastRegistered =
    new java.util.concurrent.atomic.AtomicReference[(SparkSession, String)]()

  /** Register every table as a temp view so `spark.sql` works against sfDir.
    * Idempotent and memoized per (session, sfDir). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (lastRegistered.get() != ((spark, sfDir))) {
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
      lastRegistered.set((spark, sfDir))
    }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated corpus (/root/repo/TESTDATA.md).
  * One parquet file per table under the given scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    // for: read it as epoch nanos and convert to a microsecond timestamp.
    // The corpus carries whole-microsecond values, so this is lossless and
    // matches what DuckDB sees after CAST(ts AS TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None    => df
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

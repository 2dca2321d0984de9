package graft.queries

import graft.SparkTestBase

/** Every registered query must EXECUTE on empty tables (added r6).
  *
  * At 100 TB empty inputs are routine — a freshly-created partition, a
  * filter that eliminates a whole day, a source with no traffic yet. A
  * query that throws on zero rows is a pipeline outage, not an edge case.
  * This spec materializes every table's schema with zero rows and runs the
  * ENTIRE registry end-to-end (plan + execute), asserting nothing throws.
  * (Iterative builders like dedup_clusters run their convergence loop on
  * the empty graph — the empty/None convergence path is exercised here.)
  */
class EmptyInputSpec extends SparkTestBase {

  test("all registered queries execute on empty tables") {
    val src = "/root/testdata/sf0.001"
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    graft.Tables.names.foreach { t =>
      graft.Tables.load(spark, src, t).limit(0)
        .write.mode("overwrite").parquet(s"$emptyDir/$t.parquet")
    }
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).queryExecution.toRdd.count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    spark.catalog.clearCache()
    assert(failures.isEmpty,
      s"queries failing on empty input:\n${failures.mkString("\n")}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(emptyDir))
  }
}

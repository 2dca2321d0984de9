package graft.sql

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Z-order layout: correctness of the Morton interleave and a measured
  * data-skipping win — the row groups a 2-dim selective scan reads under a
  * Z-ordered layout emit fewer rows than under a 1-dim sorted layout of the
  * SAME data with the SAME row-group size (parquet min/max pruning is the
  * mechanism; the spec reads the scan node's numOutputRows metric, which
  * counts rows surviving row-group pruning + pushdown, not post-scan
  * filtering).
  */
class ZOrderSpec extends SparkTestBase {

  test("zValue interleaves bits (known fixtures, monotone on the diagonal)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    // x bits land even, y bits odd: (1,0)->1, (0,1)->2, (1,1)->3, (2,2)->12
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 12L, (1L << 32) - 1))
  }

  test("property: zValue is a bijection on the 16-bit grid (round-trips bits)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genCoord = Gen.choose(0L, (1L << ZOrder.Bits) - 1)
    // de-interleave model: even bits → x, odd bits → y
    def unz(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until ZOrder.Bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val p = Prop.forAll(genCoord, genCoord) { (x, y) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zValue(col("x"), col("y"))).as[Long].collect()(0)
      unz(z) == ((x, y))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("z-ordered layout scans fewer rows than 1-dim sort for a 2-dim predicate") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0).toDouble
    val maxPk = li.agg(max("l_partkey")).head().getLong(0).toDouble
    val gx = ZOrder.gridScale(col("l_orderkey"), 0, maxOk)
    val gy = ZOrder.gridScale(col("l_partkey"), 0, maxPk)

    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // tiny row groups so one file holds many independently-prunable groups
    // (~8 KB → ~240 groups of ~250 rows; a production 100 TB table has
    // thousands of row groups per partition, which is the regime where the
    // Z-curve's box-coverage beats a 1-dim sort — at 30 coarse groups the
    // curve's perimeter overhead still dominates, measured below)
    def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024)
        .parquet(path)
    write(li.orderBy("l_orderkey"), s"$base/sorted1d")
    write(ZOrder.zOrderBy(li, gx, gy, numFiles = 1), s"$base/zorder")

    // center-box predicate: selective on BOTH dimensions (~6% of rows).
    // LONG literals, not doubles — a double bound would wrap the long
    // column in a CAST and kill parquet filter pushdown entirely
    def pred = col("l_orderkey").between((maxOk * 0.40).toLong, (maxOk * 0.65).toLong) &&
      col("l_partkey").between((maxPk * 0.40).toLong, (maxPk * 0.65).toLong)
    def scannedRows(path: String): (Long, Long) = {
      // drive THE SAME queryExecution whose metrics we read (count() would
      // build and execute a separate plan, leaving this one's metrics at 0)
      val qe = spark.read.parquet(path).filter(pred).queryExecution
      val n = qe.toRdd.count()
      val scan = qe.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get
      (scan.metrics("numOutputRows").value, n)
    }
    val (rowsSorted, nSorted) = scannedRows(s"$base/sorted1d")
    val (rowsZ, nZ) = scannedRows(s"$base/zorder")
    assert(nSorted == nZ, "layouts must return identical results")
    assert(nSorted > 0)
    // the 1-dim sort prunes only on l_orderkey (reads ~25% of groups but all
    // partkeys within); the Z-order bounds both dims per group
    assert(rowsZ < rowsSorted,
      s"z-order must scan fewer rows: z=$rowsZ vs sorted=$rowsSorted (result rows $nSorted)")
    assert(rowsZ.toDouble / rowsSorted <= 0.8,
      s"expected a material skipping win, got z=$rowsZ vs sorted=$rowsSorted")
  }
}

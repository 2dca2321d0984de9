package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping
  * (added r5).
  *
  * Parquet prunes row groups by per-column min/max; a single-column sort
  * gives perfect skipping on that column and none on any other. Interleaving
  * the bits of TWO rank-normalized dimensions into one Morton value and
  * laying the file out in that order bounds BOTH dimensions' min/max ranges
  * per row group — the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * here as a pure Column expression + layout helper over plain parquet.
  *
  * Everything is codegen-able bit arithmetic (16 shift/or terms per
  * dimension) — no UDF, no custom expression needed.
  */
object ZOrder {

  /** Bits per dimension; 16+16 interleave into a non-negative int64. */
  val Bits = 16

  /** Interleave the low [[Bits]] bits of two non-negative int columns:
    * x's bit i → result bit 2i, y's bit i → result bit 2i+1. Inputs must
    * already be rank/scale-normalized into [0, 2^Bits). */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale a value in [lo, hi] into the [0, 2^Bits) grid (clamped). */
  def gridScale(c: Column, lo: Double, hi: Double): Column = {
    val cells = (1L << Bits) - 1
    least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)).cast("long")))
  }

  /** Rewrite `df` in Z-order over the two given grid columns: range-
    * partition by the Morton value (so row groups tile the Z-curve), sort
    * within partitions, and drop the helper column. At 100 TB this is the
    * one-off layout job whose cost every later selective scan amortizes. */
  def zOrderBy(df: DataFrame, xGrid: Column, yGrid: Column,
      numFiles: Int): DataFrame = {
    // helper column name must not collide with a user column — a fixed
    // "__z" would silently overwrite and then DROP a real __z column
    val zCol = Iterator.from(0).map(i => s"__z$i")
      .dropWhile(df.columns.contains).next()
    val z = zValue(xGrid, yGrid)
    df.withColumn(zCol, z)
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}

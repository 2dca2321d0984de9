package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-version-proof fixed-point natural log (r8 doctrine, Queries.scala).
  *
  * `round(ln(x), 6)` matched the local DuckDB bitwise yet hash-failed the
  * driver's build in r6 AND r7: libm `ln` and decimal `round` of a double
  * vary across engine BUILDS, so no probe against the local engine can prove
  * them portable. This object computes `ln6(a, b) ≈ ln(a/b) · 10^6` for
  * positive int64 `a`, `b` using ONLY int64 multiply / add / compare /
  * floor-division — operations every SQL engine defines identically — so the
  * result is bit-identical on any engine BY CONSTRUCTION, not by luck.
  *
  * Construction (all on integer grids; G = 10^9):
  *   1. sign s = ±1 via a ≥ b; (hi, lo) = (max, min); work with r = hi/lo ≥ 1.
  *   2. range reduction: k = ⌊log2 r⌋ from a generated power-of-two CASE
  *      ladder over q = hi div lo (exact: 2^k ≤ q ≤ r < q+1 ≤ 2^(k+1));
  *      P = 2^k from the same ladder.
  *   3. mantissa m9 = (hi·G) div (lo·P) ∈ [G, 2G) — m = r / 2^k ∈ [1, 2).
  *   4. z9 = ((m9 − G)·G) div (m9 + G) — z = (m−1)/(m+1) ∈ [0, 1/3], so the
  *      atanh series ln m = 2(z + z³/3 + z⁵/5 + …) converges geometrically
  *      with ratio z² ≤ 1/9; terms through z¹¹/11 bound the truncation by
  *      z¹³/(13(1−z²)) < 6·10⁻⁸.
  *   5. ln6 = s · ((k·LN2_9 + 2·Σ terms) div 1000), LN2_9 = ⌊ln 2 · G⌋ a
  *      shared literal — the ONE constant both engines read as text.
  *
  * Accuracy: within ~2·10⁻⁶ of true ln(a/b) (each floor loses ≤ 10⁻⁹, the
  * final div 1000 quantizes to the 10⁻⁶ grid) — same quality as the old
  * rounded-libm grid, but deterministic everywhere. Overflow bound: hi·G
  * must fit int64 ⇒ hi ≤ 9.2·10⁹. Gate-scale counts top out ~10⁷; for
  * 100 TB corpora (counts ~10¹³) widen steps 3–4 to DECIMAL(38,0) on both
  * engines (the token_burstiness widening discipline) — the construction is
  * unchanged.
  *
  * Two surfaces, one construction:
  *   - [[withLn6]] appends the chain to a DataFrame as named intermediate
  *     columns (CollapseProject keeps multiply-referenced steps as aliases,
  *     so the expression tree stays linear — no 2^depth inline blowup);
  *   - [[sqlCtes]] emits the identical chain as DuckDB CTE text for the
  *     oracle twin (`//` floor-div == Spark `div` for the all-positive
  *     operands used here).
  */
private[graft] object LnGrid {

  /** ⌊ln 2 · 10^9⌋ — the shared grid constant. */
  val Ln2_9 = 693147180L

  private val G = 1000000000L

  /** Generated CASE ladder: ⌊log2 q⌋ for a positive int64 SQL expression. */
  private def floorLog2Sql(q: String): String = {
    val branches =
      (62 to 1 by -1).map(k => s"WHEN $q >= ${1L << k} THEN $k").mkString(" ")
    s"(CASE $branches ELSE 0 END)"
  }

  /** Generated CASE ladder: 2^⌊log2 q⌋ for a positive int64 SQL expression. */
  private def pow2Sql(q: String): String = {
    val branches =
      (62 to 1 by -1).map(k => s"WHEN $q >= ${1L << k} THEN ${1L << k}").mkString(" ")
    s"(CASE $branches ELSE 1 END)"
  }

  /** The per-step (name, defining SQL) chain shared by both surfaces.
    * `divOp` is the engine's integer floor division ("div" Spark, "//"
    * DuckDB) — identical results for the all-positive operands here. */
  private def steps(pre: String, divOp: String): Seq[(String, String)] = Seq(
    s"${pre}q"   -> s"${pre}hi $divOp ${pre}lo",
    s"${pre}k"   -> floorLog2Sql(s"${pre}q"),
    s"${pre}p"   -> pow2Sql(s"${pre}q"),
    s"${pre}m"   -> s"(${pre}hi * $G) $divOp (${pre}lo * ${pre}p)",
    s"${pre}z"   -> s"((${pre}m - $G) * $G) $divOp (${pre}m + $G)",
    s"${pre}z2"  -> s"(${pre}z * ${pre}z) $divOp $G",
    s"${pre}t3"  -> s"(${pre}z * ${pre}z2) $divOp $G",
    s"${pre}t5"  -> s"(${pre}t3 * ${pre}z2) $divOp $G",
    s"${pre}t7"  -> s"(${pre}t5 * ${pre}z2) $divOp $G",
    s"${pre}t9"  -> s"(${pre}t7 * ${pre}z2) $divOp $G",
    s"${pre}t11" -> s"(${pre}t9 * ${pre}z2) $divOp $G")

  // k is an INT-typed CASE result: CAST before the Ln2_9 product, or Spark
  // (non-ANSI) silently wraps int32 at k ≥ 4 while DuckDB raises — the
  // exact cross-engine divergence class this object exists to kill
  private def outSql(pre: String, divOp: String): String =
    s"${pre}s * ((CAST(${pre}k AS BIGINT) * $Ln2_9 + 2 * (${pre}z + ${pre}t3 $divOp 3 + " +
      s"${pre}t5 $divOp 5 + ${pre}t7 $divOp 7 + ${pre}t9 $divOp 9 + " +
      s"${pre}t11 $divOp 11)) $divOp 1000)"

  private def tempNames(pre: String): Seq[String] =
    Seq("s", "hi", "lo", "q", "k", "p", "m", "z", "z2", "t3", "t5", "t7", "t9", "t11")
      .map(pre + _)

  /** Appends `out` = ln6(a, b) (BIGINT, the 10⁻⁶ ln grid) to `df`.
    * `a`, `b` must be positive integral columns with max(a,b) ≤ 9.2e9;
    * a null or non-positive operand yields a null `out` (Spark div-by-zero
    * semantics) — gate such rows before or after, as the call site needs.
    * `pre` must be unique among concurrently-live temp prefixes. */
  def withLn6(df: DataFrame, a: Column, b: Column, out: String,
      pre: String = "__ln6_"): DataFrame = {
    // `lo` is floored to 1 so the chain never divides by zero (ANSI mode
    // would raise, not null); `ok` gates the OUTPUT to null for rows whose
    // true lo is non-positive — same CASE on the DuckDB side
    var d = df
      .withColumn(s"${pre}ok", least(a, b) >= 1L)
      .withColumn(s"${pre}s", when(a >= b, 1L).otherwise(-1L))
      .withColumn(s"${pre}hi", greatest(greatest(a, b).cast("long"), lit(1L)))
      .withColumn(s"${pre}lo", greatest(least(a, b).cast("long"), lit(1L)))
    for ((name, sql) <- steps(pre, "div")) d = d.withColumn(name, expr(sql))
    d.withColumn(out,
        when(col(s"${pre}ok"), expr(outSql(pre, "div"))).otherwise(lit(null)))
      .drop(s"${pre}ok" +: tempNames(pre): _*)
  }

  /** The identical chain as DuckDB CTE text: consumes `inCte`, emits CTE
    * `${pre}out` = SELECT inCte.*, <outName BIGINT>. Append after the CTE
    * that defines the operands; reference `${pre}out` downstream. */
  def sqlCtes(inCte: String, aExpr: String, bExpr: String, outName: String,
      pre: String): String = {
    val base =
      s"""${pre}b AS (SELECT *,
         |  LEAST(CAST($aExpr AS BIGINT), CAST($bExpr AS BIGINT)) >= 1 AS ${pre}ok,
         |  CASE WHEN ($aExpr) >= ($bExpr) THEN 1 ELSE -1 END AS ${pre}s,
         |  GREATEST(GREATEST(CAST($aExpr AS BIGINT), CAST($bExpr AS BIGINT)), 1) AS ${pre}hi,
         |  GREATEST(LEAST(CAST($aExpr AS BIGINT), CAST($bExpr AS BIGINT)), 1) AS ${pre}lo
         |  FROM $inCte)""".stripMargin
    val chain = steps(pre, "//").zipWithIndex.map { case ((name, sql), i) =>
      val prev = if (i == 0) s"${pre}b" else s"${pre}c$i"
      s"${pre}c${i + 1} AS (SELECT *, $sql AS $name FROM $prev)"
    }
    val n = steps(pre, "//").size
    val out =
      s"""${pre}out AS (SELECT * EXCLUDE (${pre}ok, ${tempNames(pre).mkString(", ")}),
         |  CASE WHEN ${pre}ok THEN ${outSql(pre, "//")} ELSE NULL END AS $outName
         |  FROM ${pre}c$n)""".stripMargin
    (base +: chain :+ out).mkString(",\n")
  }
}

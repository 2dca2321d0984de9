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

  /** Pure-Scala mirror of the ratio chain — the in-process REFERENCE
    * implementation specs replay against (JVM Long division truncates,
    * which equals floor for the all-positive operands here, exactly like
    * the SQL chain), and since r8 ALSO the production Spark-side kernel:
    * [[graft.functions.Ln6]] calls it from codegen, so one tight JVM
    * method replaces the 15-column projected chain at every call site.
    * Must stay step-for-step identical to [[steps]]. */
  def ln6Ref(a: Long, b: Long): Long = {
    require(a >= 1 && b >= 1, s"ln6Ref needs positive operands, got ($a, $b)")
    val s = if (a >= b) 1L else -1L
    val hi = math.max(a, b)
    val lo = math.min(a, b)
    val q = hi / lo
    val k = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val p = 1L << k
    val m = (hi * G) / (lo * p)
    val z = ((m - G) * G) / (m + G)
    val z2 = (z * z) / G
    val t3 = (z * z2) / G
    val t5 = (t3 * z2) / G
    val t7 = (t5 * z2) / G
    val t9 = (t7 * z2) / G
    val t11 = (t9 * z2) / G
    s * ((k * Ln2_9 + 2 * (z + t3 / 3 + t5 / 5 + t7 / 7 + t9 / 9 + t11 / 11)) / 1000)
  }

  /** Pure-Scala mirror of the single-operand ln(x)·10^9 chain
    * ([[steps9]]) — step-for-step identical; feeds [[ln6WideRef]]. */
  def v9Ref(x: Long): Long = {
    require(x >= 1, s"v9Ref needs a positive operand, got $x")
    val fl = 63 - java.lang.Long.numberOfLeadingZeros(x) // ⌊log2 x⌋
    val sh = if (fl >= 31) fl - 30 else 0 // shiftSql's thresholds exactly
    val ps = 1L << sh
    val x2 = x / ps
    val k = 63 - java.lang.Long.numberOfLeadingZeros(x2)
    val p = 1L << k
    val m = (x2 * G) / p
    val z = ((m - G) * G) / (m + G)
    val z2 = (z * z) / G
    val t3 = (z * z2) / G
    val t5 = (t3 * z2) / G
    val t7 = (t5 * z2) / G
    val t9 = (t7 * z2) / G
    val t11 = (t9 * z2) / G
    (k.toLong + sh) * Ln2_9 + 2 * (z + t3 / 3 + t5 / 5 + t7 / 7 + t9 / 9 + t11 / 11)
  }

  /** Pure-Scala mirror of the WIDE chain's combination step — the
    * reference for [[withLn6Wide]] and the codegen kernel of
    * [[graft.functions.Ln6Wide]]. Must stay identical to the sg/mag/
    * div-1000 combination in [[withLn6Wide]]/[[sqlCtesWide]]. */
  def ln6WideRef(a: Long, b: Long): Long = {
    require(a >= 1 && b >= 1, s"ln6WideRef needs positive operands, got ($a, $b)")
    val va = v9Ref(a)
    val vb = v9Ref(b)
    val sg = if (va >= vb) 1L else -1L
    sg * ((math.max(va, vb) - math.min(va, vb)) / 1000)
  }

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

  // ---- wide variant: operands up to 2^62 ---------------------------------
  // The ratio form above needs hi·10^9 to fit int64 (hi ≤ 9.2e9). Sites
  // whose ln arguments are cross-PRODUCTS of counts (JSD mixture terms)
  // exceed that, so the wide form computes ln a and ln b separately on the
  // 10^-9 grid — each operand first shifted down to < 2^31 by a tracked
  // power of two (truncation ≤ 2^-30 relative, the k·ln2 contribution
  // re-added exactly) — and subtracts on the magnitude (positive-operand
  // division only: Spark `div` truncates toward zero while DuckDB `//`
  // floors, so a NEGATIVE intermediate must never reach a division).

  /** CASE ladder: shift = max(0, ⌊log2 x⌋ − 30). */
  private def shiftSql(x: String): String = {
    val branches =
      (62 to 31 by -1).map(k => s"WHEN $x >= ${1L << k} THEN ${k - 30}").mkString(" ")
    s"(CASE $branches ELSE 0 END)"
  }

  /** CASE ladder: 2^shift for the same thresholds. */
  private def shiftPowSql(x: String): String = {
    val branches =
      (62 to 31 by -1).map(k => s"WHEN $x >= ${1L << k} THEN ${1L << (k - 30)}").mkString(" ")
    s"(CASE $branches ELSE 1 END)"
  }

  /** ln(x)·10^9 chain for a single positive operand column `xCol` < 2^62:
    * v9 = (k + shift)·LN2_9 + atanh series of the normalized mantissa. */
  private def steps9(pre: String, divOp: String, xCol: String): Seq[(String, String)] = Seq(
    s"${pre}sh"  -> shiftSql(xCol),
    s"${pre}ps"  -> shiftPowSql(xCol),
    s"${pre}x2"  -> s"$xCol $divOp ${pre}ps",
    s"${pre}k"   -> floorLog2Sql(s"${pre}x2"),
    s"${pre}p"   -> pow2Sql(s"${pre}x2"),
    s"${pre}m"   -> s"(${pre}x2 * $G) $divOp ${pre}p",
    s"${pre}z"   -> s"((${pre}m - $G) * $G) $divOp (${pre}m + $G)",
    s"${pre}z2"  -> s"(${pre}z * ${pre}z) $divOp $G",
    s"${pre}t3"  -> s"(${pre}z * ${pre}z2) $divOp $G",
    s"${pre}t5"  -> s"(${pre}t3 * ${pre}z2) $divOp $G",
    s"${pre}t7"  -> s"(${pre}t5 * ${pre}z2) $divOp $G",
    s"${pre}t9"  -> s"(${pre}t7 * ${pre}z2) $divOp $G",
    s"${pre}t11" -> s"(${pre}t9 * ${pre}z2) $divOp $G",
    s"${pre}v9"  -> (s"(CAST(${pre}k AS BIGINT) + CAST(${pre}sh AS BIGINT)) * $Ln2_9 " +
      s"+ 2 * (${pre}z + ${pre}t3 $divOp 3 + ${pre}t5 $divOp 5 + ${pre}t7 $divOp 7 " +
      s"+ ${pre}t9 $divOp 9 + ${pre}t11 $divOp 11)"))

  private def temp9Names(pre: String): Seq[String] =
    Seq("sh", "ps", "x2", "k", "p", "m", "z", "z2", "t3", "t5", "t7", "t9", "t11", "v9")
      .map(pre + _)

  /** Wide-range ln6(a, b) for positive a, b up to 2^62 — result identical
    * in KIND to [[withLn6]] (BIGINT, 10^-6 grid; null for non-positive
    * operands) but a DIFFERENT defined function (two single-operand chains
    * subtracted rather than one ratio chain), so a query must use the SAME
    // variant on both engines. */
  def withLn6Wide(df: DataFrame, a: Column, b: Column, out: String,
      pre: String): DataFrame =
    df.withColumn(out, graft.functions.LnGridFunctions.ln6Wide(a, b))

  /** The original projected-column form of the wide chain — retained as
    * the spec's parity witness: LnGridSpec asserts chain ≡ [[ln6WideRef]]
    * ≡ the [[withLn6Wide]] codegen kernel, which is what ties the DuckDB
    * oracle CTEs ([[sqlCtesWide]]) to the production expression. */
  private[graft] def withLn6WideChain(df: DataFrame, a: Column, b: Column, out: String,
      pre: String): DataFrame = {
    var d = df
      .withColumn(s"${pre}ok", least(a, b) >= 1L)
      .withColumn(s"${pre}xa", greatest(a.cast("long"), lit(1L)))
      .withColumn(s"${pre}xb", greatest(b.cast("long"), lit(1L)))
    for ((name, sql) <- steps9(s"${pre}a_", "div", s"${pre}xa")) d = d.withColumn(name, expr(sql))
    for ((name, sql) <- steps9(s"${pre}b_", "div", s"${pre}xb")) d = d.withColumn(name, expr(sql))
    d = d
      .withColumn(s"${pre}sg",
        when(col(s"${pre}a_v9") >= col(s"${pre}b_v9"), 1L).otherwise(-1L))
      .withColumn(s"${pre}mag",
        greatest(col(s"${pre}a_v9"), col(s"${pre}b_v9"))
          - least(col(s"${pre}a_v9"), col(s"${pre}b_v9")))
    d.withColumn(out,
        when(col(s"${pre}ok"),
          col(s"${pre}sg") * expr(s"${pre}mag div 1000")).otherwise(lit(null)))
      .drop(Seq(s"${pre}ok", s"${pre}xa", s"${pre}xb", s"${pre}sg", s"${pre}mag") ++
        temp9Names(s"${pre}a_") ++ temp9Names(s"${pre}b_"): _*)
  }

  /** DuckDB CTE chain for [[withLn6Wide]] — consumes `inCte`, emits
    * `${pre}out` with `outName`. */
  def sqlCtesWide(inCte: String, aExpr: String, bExpr: String, outName: String,
      pre: String): String = {
    val base =
      s"""${pre}w AS (SELECT *,
         |  LEAST(CAST($aExpr AS BIGINT), CAST($bExpr AS BIGINT)) >= 1 AS ${pre}ok,
         |  GREATEST(CAST($aExpr AS BIGINT), 1) AS ${pre}xa,
         |  GREATEST(CAST($bExpr AS BIGINT), 1) AS ${pre}xb
         |  FROM $inCte)""".stripMargin
    val stepsAll = steps9(s"${pre}a_", "//", s"${pre}xa") ++
      steps9(s"${pre}b_", "//", s"${pre}xb")
    val chain = stepsAll.zipWithIndex.map { case ((name, sql), i) =>
      val prev = if (i == 0) s"${pre}w" else s"${pre}c$i"
      s"${pre}c${i + 1} AS (SELECT *, $sql AS $name FROM $prev)"
    }
    val n = stepsAll.size
    val fin =
      s"""${pre}f AS (SELECT *,
         |  CASE WHEN ${pre}a_v9 >= ${pre}b_v9 THEN 1 ELSE -1 END AS ${pre}sg,
         |  GREATEST(${pre}a_v9, ${pre}b_v9) - LEAST(${pre}a_v9, ${pre}b_v9) AS ${pre}mag
         |  FROM ${pre}c$n)""".stripMargin
    val drops = (Seq("ok", "xa", "xb", "sg", "mag").map(pre + _) ++
      temp9Names(s"${pre}a_") ++ temp9Names(s"${pre}b_")).mkString(", ")
    val out =
      s"""${pre}out AS (SELECT * EXCLUDE ($drops),
         |  CASE WHEN ${pre}ok THEN ${pre}sg * (${pre}mag // 1000) ELSE NULL END AS $outName
         |  FROM ${pre}f)""".stripMargin
    (base +: chain) ++ Seq(fin, out) mkString ",\n"
  }

  /** Appends `out` = ln6(a, b) (BIGINT, the 10⁻⁶ ln grid) to `df`.
    * `a`, `b` must be positive integral columns with max(a,b) ≤ 9.2e9;
    * a null or non-positive operand yields a null `out` (Spark div-by-zero
    * semantics) — gate such rows before or after, as the call site needs.
    * `pre` must be unique among concurrently-live temp prefixes. */
  def withLn6(df: DataFrame, a: Column, b: Column, out: String,
      pre: String = "__ln6_"): DataFrame =
    df.withColumn(out, graft.functions.LnGridFunctions.ln6(a, b))

  /** The original projected-column form — retained as the spec's parity
    * witness (chain ≡ [[ln6Ref]] ≡ the production codegen kernel), which
    * is what ties the DuckDB oracle CTEs ([[sqlCtes]]) to [[withLn6]]. */
  private[graft] def withLn6Chain(df: DataFrame, a: Column, b: Column, out: String,
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

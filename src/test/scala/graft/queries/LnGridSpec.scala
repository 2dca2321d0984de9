package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Accuracy + algebraic contracts for the engine-version-proof fixed-point
  * ln (LnGrid). The CROSS-ENGINE guarantee needs no test — every op is
  * int64 multiply/add/compare/floor-div, defined identically everywhere;
  * what these pin is that the DEFINED function tracks true ln closely
  * enough to stand in for the old rounded-libm grid, and the exact
  * algebraic symmetries call sites rely on. */
class LnGridSpec extends SparkTestBase {

  test("ln6 tracks math.log within 2.5e-6 over a dense ratio sweep") {
    import spark.implicits._
    val as = (1L to 300L) ++ Seq(1000L, 4097L, 65537L, 123457L, 9999991L,
      1000000007L, 9199999999L)
    val bs = Seq(1L, 2L, 3L, 7L, 97L, 1000L, 31337L, 999983L, 9199999999L)
    val pairs = for (a <- as; b <- bs) yield (a, b)
    val out = LnGrid.withLn6(pairs.toDF("a", "b"), col("a"), col("b"), "l6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == pairs.length)
    out.foreach { case (a, b, l6) =>
      val err = math.abs(l6 / 1e6 - math.log(a.toDouble / b))
      assert(err <= 2.5e-6, s"ln6($a, $b) = $l6: err $err")
    }
  }

  test("ln6 is exactly antisymmetric and zero on equality") {
    import spark.implicits._
    val pairs = Seq((5L, 3L), (3L, 5L), (1L, 1000000L), (1000000L, 1L),
      (17L, 17L), (123456789L, 987654321L), (987654321L, 123456789L))
    val got = LnGrid.withLn6(pairs.toDF("a", "b"), col("a"), col("b"), "l6")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // magnitude-symmetric by construction: ln6(a,b) == -ln6(b,a) EXACTLY
    assert(got((5L, 3L)) == -got((3L, 5L)))
    assert(got((1L, 1000000L)) == -got((1000000L, 1L)))
    assert(got((123456789L, 987654321L)) == -got((987654321L, 123456789L)))
    assert(got((17L, 17L)) == 0L)
    // the extreme ratio lands on the grid's ln(1e6): |−13.815511| scaled
    assert(math.abs(got((1L, 1000000L)) + 13815511L) <= 3L)
  }

  test("SQL chain equals the pure-Scala reference implementation exactly") {
    import spark.implicits._
    val pairs = (for (a <- 1L to 200L; b <- Seq(1L, 3L, 97L, 999983L)) yield (a, b)) ++
      Seq((9199999999L, 7L), (123456789L, 987654321L))
    val got = LnGrid.withLn6Chain(pairs.toDF("a", "b"), col("a"), col("b"), "l6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, l6) =>
      assert(l6 == LnGrid.ln6Ref(a, b), s"SQL chain diverged from ln6Ref at ($a, $b)")
    }
  }

  test("r8 native expressions are bit-identical to the projected chains (both variants)") {
    import spark.implicits._
    // ratio form: chain (the oracle's CTE text, pinned ≡ ln6Ref above) vs
    // the production Ln6 codegen expression that withLn6 now emits
    val pairs = (for (a <- 1L to 150L; b <- Seq(1L, 2L, 97L, 31337L, 9199999999L))
      yield (a, b)) ++ Seq((0L, 5L), (5L, 0L), (9199999999L, 9199999998L))
    val df = pairs.toDF("a", "b")
    val both = LnGrid.withLn6(
      LnGrid.withLn6Chain(df, col("a"), col("b"), "chain6"),
      col("a"), col("b"), "expr6").collect()
    both.foreach { r =>
      assert(r.isNullAt(2) == r.isNullAt(3),
        s"null gate diverged at (${r.getLong(0)}, ${r.getLong(1)})")
      if (!r.isNullAt(2))
        assert(r.getLong(2) == r.getLong(3),
          s"Ln6 diverged from the chain at (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // wide form: same check over the 2^62 operand range
    val wp = (for (a <- Seq(1L, 7L, 999983L, 123456789012345L, (1L << 62) - 1L);
      b <- Seq(1L, 3L, 987654321098L, (1L << 61) + 12345L)) yield (a, b)) ++
      Seq((0L, 5L), (5L, 0L))
    val wboth = LnGrid.withLn6Wide(
      LnGrid.withLn6WideChain(wp.toDF("a", "b"), col("a"), col("b"), "chain6", "__wc_"),
      col("a"), col("b"), "expr6", "__we_").collect()
    wboth.foreach { r =>
      assert(r.isNullAt(2) == r.isNullAt(3),
        s"wide null gate diverged at (${r.getLong(0)}, ${r.getLong(1)})")
      if (!r.isNullAt(2))
        assert(r.getLong(2) == r.getLong(3),
          s"Ln6Wide diverged from the chain at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("wide variant tracks math.log within 2.5e-6 up to 2^62 operands") {
    import spark.implicits._
    val as = Seq(1L, 2L, 7L, 1000L, 999983L, 9199999999L, 123456789012345L,
      (1L << 62) - 1L, 4611686018427387L)
    val bs = Seq(1L, 3L, 1000003L, 987654321098L, (1L << 61) + 12345L)
    val pairs = for (a <- as; b <- bs) yield (a, b)
    val out = LnGrid.withLn6Wide(pairs.toDF("a", "b"), col("a"), col("b"), "l6", "__w_")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, l6) =>
      val err = math.abs(l6 / 1e6 - (math.log(a.toDouble) - math.log(b.toDouble)))
      assert(err <= 2.5e-6, s"ln6wide($a, $b) = $l6: err $err")
    }
    // antisymmetric by construction (sign applied to the |v9a - v9b| magnitude)
    val g = out.map { case (a, b, l) => (a, b) -> l }.toMap
    assert(g((2L, 3L)) == -LnGrid.withLn6Wide(Seq((3L, 2L)).toDF("a", "b"),
      col("a"), col("b"), "l6", "__w_").head().getLong(2))
  }

  test("non-positive operands yield null, not a crash (Spark div-by-zero)") {
    import spark.implicits._
    val out = LnGrid.withLn6(Seq((0L, 5L), (5L, 0L), (3L, 2L)).toDF("a", "b"),
      col("a"), col("b"), "l6").collect()
    assert(out.count(_.isNullAt(2)) == 2)
    assert(out.count(r => !r.isNullAt(2) && r.getLong(2) > 0) == 1)
  }
}

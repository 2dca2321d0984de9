package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

import graft.queries.LnGrid

/** The fixed-point ln grid as native codegen expressions (SURVEY §2.5
  * preference (b)) — the same rewrite story as [[ShingleSet]] /
  * [[SimhashFingerprint]]: [[graft.queries.LnGrid.withLn6]]'s original
  * form projected ~15 intermediate int64 columns per call site, two of
  * them 62-branch CASE ladders, which bloats whole-stage codegen (janino
  * compile time is a per-query DRIVER cost) and widens every row in
  * flight. Each expression here is one tight JVM static call —
  * `LnGrid.ln6Ref` / `LnGrid.ln6WideRef`, the SAME pure-Scala mirrors the
  * specs already pin step-for-step against the SQL chain text that the
  * DuckDB oracle still runs — so the swap cannot change a single output
  * bit (LnGridSpec asserts chain ≡ ref ≡ expression on a dense sweep).
  *
  * Null semantics, identical to the column chains they replace: a null
  * operand ⇒ NULL (nullIntolerant), a non-positive operand ⇒ NULL (the
  * chains' `ok` gate).
  */
private[graft] trait Ln6Like extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  /** Fully-qualified static kernel, e.g. "graft.queries.LnGrid.ln6Ref". */
  protected def kernel: String
  protected def eval2(a: Long, b: Long): Long

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[Long]
    val bv = b.asInstanceOf[Long]
    if (av < 1L || bv < 1L) null else eval2(av, bv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a < 1L || $b < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $kernel($a, $b);
         |}
       """.stripMargin
    })
}

/** ln6(a, b) ≈ ln(a/b)·10^6 — the ratio chain (operands ≤ 9.2e9). */
case class Ln6(left: Expression, right: Expression) extends Ln6Like {
  override def prettyName: String = "ln6"
  override protected def kernel: String = "graft.queries.LnGrid.ln6Ref"
  override protected def eval2(a: Long, b: Long): Long = LnGrid.ln6Ref(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ln6(a, b) via two single-operand ln(x)·10^9 chains (operands ≤ 2^62) —
  * a DIFFERENT defined function from [[Ln6]] (see [[LnGrid.withLn6Wide]]);
  * call sites must use the same variant as their oracle CTEs. */
case class Ln6Wide(left: Expression, right: Expression) extends Ln6Like {
  override def prettyName: String = "ln6_wide"
  override protected def kernel: String = "graft.queries.LnGrid.ln6WideRef"
  override protected def eval2(a: Long, b: Long): Long = LnGrid.ln6WideRef(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LnGridFunctions {
  /** Column-API entry points; operands are cast to bigint like the
    * chains' greatest/least casts did. */
  def ln6(a: Column, b: Column): Column =
    Bridge.column(Ln6(Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))

  def ln6Wide(a: Column, b: Column): Column =
    Bridge.column(Ln6Wide(Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))
}

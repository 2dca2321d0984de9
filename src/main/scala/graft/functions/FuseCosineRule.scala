package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the higher-order-function cosine formulation
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v)
  *   / (sqrt(aggregate(zip_with(a, a, ...), 0.0, ...)) * sqrt(aggregate(zip_with(b, b, ...), 0.0, ...)))
  * }}}
  *
  * and fuse it into the codegen'd [[CosineSimilarity]] expression (one tight
  * loop, ~10× fewer virtual calls; bit-identical result on well-formed
  * inputs — both are left-folds in double, and [[CosineSimilarity]] mirrors
  * the HOF form's semantics mode-for-mode: unequal lengths or null elements
  * ⇒ NULL, and a zero divisor (empty / zero-norm vectors) ⇒ NULL under
  * LEGACY, DIVIDE_BY_ZERO under ANSI — so fusion fires under Spark 4's
  * ANSI default too).
  *
  * The match is strict about WHICH lambda variables feed the arithmetic:
  * the multiply must consume the zip lambda's own (x, y) in order, and the
  * merge must be acc + v over its own two variables — (x, y) -> x * x or
  * (acc, v) -> acc + acc are different computations and are left alone.
  *
  * Register per-session via `spark.experimental.extraOptimizations +=
  * FuseCosineRule` or cluster-wide with [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object FuseCosineRule extends Rule[LogicalPlan] {

  /** Unwrap a double-cast of a lambda variable. */
  private def castedVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case c @ Cast(v: NamedLambdaVariable, _, _, _) if c.dataType == DoubleType => Some(v)
    case _ => None
  }

  /** Is `e` the canonical double left-fold dot product? Returns its two
    * array inputs when it is. */
  private def asDotFold(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(left, right,
          LambdaFunction(Multiply(mx, my, _),
            Seq(zl: NamedLambdaVariable, zr: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al: NamedLambdaVariable, ar: NamedLambdaVariable, _),
          Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _),
        // finish lambda must be the identity (the default)
        LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if zero.foldable && zero.dataType == DoubleType && zero.eval() == 0.0 &&
          // multiply consumes the zip lambda's OWN variables, in order
          castedVar(mx).exists(_.exprId == zl.exprId) &&
          castedVar(my).exists(_.exprId == zr.exprId) &&
          // merge is acc + v over its own two distinct variables
          Set(al.exprId, ar.exprId) == Set(accArg.exprId, vArg.exprId) &&
          al.exprId != ar.exprId &&
          fin.exprId == finArg.exprId =>
      Some((left, right))
    case _ => None
  }

  private def sameArray(x: Expression, y: Expression): Boolean =
    x.canonicalized == y.canonicalized

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // LEGACY and ANSI divisions both fuse, each into a CosineSimilarity of
    // the SAME eval mode, so observable semantics are preserved: legacy
    // Divide returns NULL on a zero divisor (empty arrays, zero-norm,
    // underflow) and the LEGACY fused loop mirrors that; ANSI Divide throws
    // DIVIDE_BY_ZERO there and the ANSI fused loop throws the identical
    // error. The lambda arithmetic itself is mode-independent — double
    // multiply/add/cast never raise under ANSI. TRY divisions are left
    // alone (rare, and TryEval wrapping differs structurally anyway).
    // Property-tested in FuseCosineRuleSpec for both modes. (Spark 4.1
    // wraps the mode in NumericEvalContext.)
    case d @ Divide(dot, Multiply(Sqrt(na), Sqrt(nb), _), ctx: NumericEvalContext)
        if ctx.evalMode == EvalMode.LEGACY || ctx.evalMode == EvalMode.ANSI =>
      (asDotFold(dot), asDotFold(na), asDotFold(nb)) match {
        case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
            if isFloatArray(a) && isFloatArray(b) && // CosineSimilarity reads getFloat
              sameArray(a, a1) && sameArray(a1, a2) &&
              sameArray(b, b1) && sameArray(b1, b2) =>
          CosineSimilarity(a, b, ctx.evalMode)
        case _ => d // not the pattern: leave the ORIGINAL node (and its EvalMode) intact
      }
  }
}

/** Cluster-wide registration: optimizer fusion + SQL functions.
  * Use with `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseCosineRule)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      // builder runs at parse time — capture the session's eval mode then,
      // exactly like Divide and VectorFunctions.registerSql, so the
      // extensions path and the temp-function path agree mode-for-mode
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1),
        EvalMode.fromSQLConf(org.apache.spark.sql.internal.SQLConf.get))))
    // the round-4 text-hash expressions, cluster-wide
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_fingerprint"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "simhash_fingerprint"),
      (exprs: Seq[Expression]) => SimhashFingerprint(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => MinhashSignature(exprs.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("min_window_md5"),
      new ExpressionInfo(classOf[MinWindowMd5].getName, "min_window_md5"),
      (exprs: Seq[Expression]) => MinWindowMd5(exprs.head,
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) => w
          case other => throw new IllegalArgumentException(
            s"min_window_md5 width must be an integer literal, got $other")
        })))
    // the round-7 shingle head, cluster-wide (same int-literal width
    // discipline as min_window_md5)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"shingle_set requires exactly 2 arguments, got ${exprs.length}")
        ShingleSet(exprs.head, exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _) => w
          case other => throw new IllegalArgumentException(
            s"shingle_set width must be an integer literal, got $other")
        })
      }))
    // the round-6 expressions, cluster-wide
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vector_l2sq"),
      new ExpressionInfo(classOf[VectorL2Sq].getName, "vector_l2sq"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"vector_l2sq requires exactly 2 arguments, got ${exprs.length}")
        VectorL2Sq(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[Expression]) => {
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fingerprints $name must be an integer literal, got $other")
        }
        WinnowFingerprints(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "w"))
      }))
    // the round-7 bloom membership-prefilter pair, cluster-wide (Spark
    // ships these for runtime join pruning but leaves them off the 4.1
    // SQL registry — see functions/BloomFunctions)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_filter_agg requires exactly 2 arguments, got ${exprs.length}")
        val items = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Long, _) => n
          case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n.toLong
          case other => throw new IllegalArgumentException(
            s"bloom_filter_agg estimatedItems must be an integer literal, got $other")
        }
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, items).toAggregateExpression()
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"might_contain requires exactly 2 arguments, got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
      }))
  }
}

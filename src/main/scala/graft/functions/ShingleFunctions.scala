package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The distinct-n-gram-shingle loop as one static call, shared by the
  * interpreted and codegen paths of [[ShingleSet]].
  *
  * Semantics — identical, element for element and in order, to the HOF
  * chain every shingle pipeline used through r7
  * (`TextQueries.shinglesExpr` for width 3, `CurationQueries.shingles5`
  * for width 5):
  *
  *   array_distinct(transform(sequence(0, size(toks) - w),
  *                            i -> array_join(slice(toks, i + 1, w), ' ')))
  *
  * and to the DuckDB oracle's list_distinct/list_transform mirror:
  * space-joined 3-token windows, first-occurrence order, duplicates
  * dropped. Tokens are concatenated at the BYTE level (no java String
  * round-trip — toString would replace ill-formed UTF-8 with U+FFFD and
  * diverge from array_join's byte semantics; the WindowMd5Util
  * discipline), and distinctness is UTF8String equality = byte equality,
  * exactly array_distinct's. */
object ShingleUtil {
  /** @return the distinct width-gram shingles in first-occurrence order,
    *         or null for a null element or fewer than `width` tokens (the
    *         HOF form is never evaluated there — every call site filters
    *         `size(toks) >= width` first, and Spark's sequence(0, n-w)
    *         would DESCEND for n < w). */
  def shingles(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    if (n < width) return null
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      words(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    i = 0
    while (i <= n - width) {
      var len = width - 1
      var j = 0
      while (j < width) { len += words(i + j).length; j += 1 }
      val b = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < width) {
        if (j > 0) { b(p) = ' '; p += 1 }
        val w = words(i + j)
        System.arraycopy(w, 0, b, p, w.length)
        p += w.length
        j += 1
      }
      seen.add(UTF8String.fromBytes(b))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct width-token shingle set of an `array<string>` token column as a
  * single map-side expression (SURVEY §2.5 preference (b)) — the same
  * rewrite story as [[MinhashSignature]] / [[MinWindowMd5]]: the
  * transform + array_join/slice HOF chain runs one interpreted lambda
  * allocation per window per document; this is one tight JVM loop.
  * Feeds every shingle pipeline (MinHash pairs/clusters, n-gram
  * Jaccard/containment, contamination, near-dup index), so the win is
  * corpus-pass-wide.
  *
  * Null semantics: null array ⇒ NULL (nullIntolerant); < width tokens ⇒
  * NULL; a null ELEMENT ⇒ NULL — all unreachable via the query surface
  * (every call site filters `size(toks) >= width` and split() never
  * yields null elements), documented like [[MinhashSignature]]. */
case class ShingleSet(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 2, s"shingle width must be >= 2, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(a: Any): Any =
    ShingleUtil.shingles(a.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sh = ctx.freshName("sh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $sh =
         |  graft.functions.ShingleUtil.shingles($a, $width);
         |if ($sh == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $sh;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column-API entry point. */
  def shingleSet(toks: Column, width: Int = 3): Column =
    Bridge.column(ShingleSet(Bridge.expression(toks), width))
}

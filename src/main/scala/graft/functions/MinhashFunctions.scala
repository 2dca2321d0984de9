package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole-document MinHash loop as one static call, shared by the
  * interpreted and codegen paths of [[MinhashSignature]].
  *
  * Semantics (identical to the explode + md5 + 8-way min-agg formulation it
  * replaced, and to the DuckDB oracle): ONE md5 per shingle; minhash k
  * (k = 0..7) is the MINIMUM over shingles of the 4-hex-char digest slice
  * [4k, 4k+4). Lowercase hex compares lexicographically exactly as the
  * 16-bit value, so the mins are tracked as ints and formatted back —
  * byte-identical to `min(substring(md5(sh), 4k+1, 4))`. */
object MinhashUtil {
  val NumHashes = 8

  private val hexChars = "0123456789abcdef".toCharArray

  /** @return the 8 minhash slices, or null to signal a null element or an
    *         empty shingle set (min over zero rows has no value — the old
    *         aggregation simply produced no row for such a doc). */
  def signature(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(NumHashes)(Int.MaxValue)
    var s = 0
    while (s < n) {
      if (shingles.isNullAt(s)) return null
      val digest = Md5Pool.get().digest(shingles.getUTF8String(s).getBytes)
      var k = 0
      while (k < NumHashes) {
        // digest bytes 2k, 2k+1 are hex chars [4k, 4k+4): a 16-bit value
        val v = ((digest(2 * k) & 0xff) << 8) | (digest(2 * k + 1) & 0xff)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      s += 1
    }
    val out = new Array[Any](NumHashes)
    var k = 0
    while (k < NumHashes) {
      val v = mins(k)
      out(k) = UTF8String.fromString(new String(Array(
        hexChars((v >> 12) & 0xf), hexChars((v >> 8) & 0xf),
        hexChars((v >> 4) & 0xf), hexChars(v & 0xf))))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** 8-slot MinHash signature of an `array<string>` shingle column as a single
  * map-side expression (SURVEY §2.5 preference (b)) — same rewrite story as
  * [[SimhashFingerprint]]: the explode to (doc, shingle) rows plus the 8-way
  * min shuffle aggregate becomes one tight JVM loop per document, map-only.
  *
  * Null semantics: null array ⇒ NULL (nullIntolerant); empty array ⇒ NULL
  * (the old min-agg produced no row for an empty group); a null ELEMENT ⇒
  * NULL for the whole document — STRICTER than the min-agg, which skipped
  * null slices and still signed the doc from the rest. All unreachable via
  * the query surface (≥ 3 token filter, transform-built shingles).
  * CALLERS MUST DROP NULL SIGNATURES before deriving band keys:
  * `concat_ws` silently skips nulls, so unfiltered null signatures would
  * all collide on the same degenerate band keys. */
case class MinhashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any =
    MinhashUtil.signature(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $sig =
         |  graft.functions.MinhashUtil.signature($a);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashFunctions {
  /** Column-API entry point. */
  def minhashSignature(shingles: Column): Column =
    Bridge.column(MinhashSignature(Bridge.expression(shingles)))
}

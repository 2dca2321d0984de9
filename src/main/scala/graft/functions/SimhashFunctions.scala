package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The whole-document SimHash vote loop as one static call, shared by the
  * interpreted and codegen paths of [[SimhashFingerprint]].
  *
  * Semantics (identical to the explode + md5 + 33-sum-agg formulation it
  * replaces, and to the DuckDB oracle CTE): for each shingle, md5; hex char
  * i (1..32) votes +1 if ≥ '8' (⟺ bit 3 of that nibble), else −1; fingerprint
  * bit (32−i) is set iff the vote sum is > 0. Result is the 32-bit
  * fingerprint as an unsigned value in a long. */
/** One thread-local MD5 digest shared by the text-hash expressions. */
private[functions] object Md5Pool {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = { val md = digests.get(); md.reset(); md }
}

object SimhashUtil {

  /** @return the fingerprint, or -1 to signal a null element (the caller
    *         maps it to SQL NULL — a real fingerprint is always in
    *         [0, 2^32), so -1 is out of band). */
  def fingerprint(shingles: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      if (shingles.isNullAt(s)) return -1L
      val digest = Md5Pool.get().digest(shingles.getUTF8String(s).getBytes)
      var i = 0
      while (i < 32) {
        // hex char i = high nibble of byte i/2 when i is even, low when odd;
        // char >= '8' ⟺ the nibble's top bit is set
        val b = digest(i >> 1)
        val topBit = if ((i & 1) == 0) (b >> 7) & 1 else (b >> 3) & 1
        votes(i) += (if (topBit == 1) 1 else -1)
        i += 1
      }
      s += 1
    }
    var fp = 0L
    var i = 0
    while (i < 32) {
      if (votes(i) > 0) fp |= 1L << (31 - i)
      i += 1
    }
    fp
  }
}

/** 32-bit SimHash fingerprint of an `array<string>` shingle column as a
  * single map-side expression (SURVEY §2.5 preference (b)).
  *
  * Replaces the round-1 formulation — explode to one row per (doc, shingle),
  * md5 + conv per row, then a 33-column vote-sum aggregate — with one tight
  * JVM loop per document: no explode blow-up (≈900 shingle rows per doc on
  * this corpus), no shuffle for the vote aggregation, and the md5s run
  * against a thread-local digest instead of per-row expression machinery.
  * The bit semantics are EXACTLY the old pipeline's (votes over distinct
  * shingles, char ≥ '8' test), so the DuckDB oracle is unchanged.
  *
  * Null semantics: null array ⇒ NULL (nullIntolerant); any null shingle
  * element ⇒ NULL for the whole document — STRICTER than the aggregate
  * formulation, where md5(null) only dropped that row's vote and the doc
  * was still fingerprinted from its remaining shingles. Empty array ⇒
  * fingerprint 0 (all votes 0, no bit set). Both corners are unreachable
  * through the query surface, which filters to ≥ 3 tokens and builds
  * shingles with transform (never null elements) first. */
case class SimhashFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_fingerprint"

  override def nullSafeEval(a: Any): Any = {
    val fp = SimhashUtil.fingerprint(a.asInstanceOf[ArrayData])
    if (fp < 0) null else fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("fp")
      s"""
         |long $fp = graft.functions.SimhashUtil.fingerprint($a);
         |if ($fp < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashFunctions {
  /** Column-API entry point. */
  def simhashFingerprint(shingles: Column): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(shingles)))
}

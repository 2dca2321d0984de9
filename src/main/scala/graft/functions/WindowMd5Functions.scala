package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The rolling-fingerprint loop as one static call, shared by the
  * interpreted and codegen paths of [[MinWindowMd5]].
  *
  * Semantics (identical to
  * `array_min(transform(sequence(0, n - w), i -> md5(array_join(slice(toks, i+1, w), ' '))))`
  * and the DuckDB mirror): md5 of every space-joined `width`-token window,
  * minimum digest returned as 32 lowercase hex chars. Lexicographic order
  * on the hex string equals unsigned byte order on the digest, so the min
  * is tracked on raw bytes and formatted once. */
object WindowMd5Util {
  private val hexChars = "0123456789abcdef".toCharArray

  /** @return min-window digest hex, or null to signal a null token or
    *         fewer than `width` tokens (no window — the query surface
    *         filters those out upstream). */
  def minWindowMd5(toks: ArrayData, width: Int): UTF8String = {
    val n = toks.numElements()
    if (n < width) return null
    // raw UTF8String bytes, NOT a java String round-trip: toString would
    // replace ill-formed UTF-8 with U+FFFD and diverge from array_join's
    // (and the DuckDB oracle's) byte-concatenation semantics
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      words(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    var best: Array[Byte] = null
    val buf = new java.io.ByteArrayOutputStream(256)
    i = 0
    while (i <= n - width) {
      buf.reset()
      var j = 0
      while (j < width) {
        if (j > 0) buf.write(' ')
        buf.write(words(i + j), 0, words(i + j).length)
        j += 1
      }
      val d = Md5Pool.get().digest(buf.toByteArray)
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = hexChars((best(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexChars(best(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** All `width`-token window fingerprints of a document in ONE rolling
    * (Rabin-Karp) pass — the 100 TB swap for dedup_substrings' hot loop,
    * where the md5-of-a-joined-50-token-slice per position costs O(width)
    * byte copies + a 300-byte digest per position; this costs O(1) per
    * position after the per-token base hashes.
    *
    * Each token is reduced to two independent 64-bit FNV-1a hashes
    * (different offset bases), then combined positionally with two odd
    * multipliers mod 2⁶⁴ — a 128-bit polynomial fingerprint, so cross-doc
    * collisions stay negligible at 100 TB gram counts (~10¹² grams →
    * ~10⁻¹⁵ birthday mass). Token boundaries are inherent (tokens hashed
    * individually before combining), so no separator ambiguity.
    *
    * Returns array<binary> — one 16-byte big-endian (h1 ∥ h2) fingerprint
    * per window position i ∈ [0, n−width] — or null for a null token or
    * fewer than `width` tokens (the callers filter those upstream).
    * Duplicated-position SETS are spec-pinned equal to the md5 form's
    * (RollingHashSpec); the gram identity itself intentionally differs. */
  def rollingWindowHashes(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    if (n < width) return null
    val a1 = new Array[Long](n)
    val a2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val bytes = toks.getUTF8String(i).getBytes
      // FNV-1a 64-bit, two offset bases for two independent lanes
      var h1 = 0xcbf29ce484222325L
      var h2 = 0x6c62272e07bb0142L
      var j = 0
      while (j < bytes.length) {
        h1 = (h1 ^ (bytes(j) & 0xffL)) * 0x100000001b3L
        h2 = (h2 ^ (bytes(j) & 0xffL)) * 0x100000001b3L
        j += 1
      }
      a1(i) = h1
      a2(i) = h2
      i += 1
    }
    val B1 = 0x5deece66dL // odd multipliers: invertible mod 2^64
    val B2 = 0x9e3779b97f4a7c15L | 1L
    // B^(width-1) for the roll-out term
    var p1 = 1L; var p2 = 1L
    i = 1
    while (i < width) { p1 *= B1; p2 *= B2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < width) {
      h1 = h1 * B1 + a1(i)
      h2 = h2 * B2 + a2(i)
      i += 1
    }
    val m = n - width + 1
    val out = new Array[Any](m)
    var pos = 0
    while (pos < m) {
      val b = new Array[Byte](16)
      var k = 0
      while (k < 8) {
        b(k) = (h1 >>> (56 - 8 * k)).toByte
        b(8 + k) = (h2 >>> (56 - 8 * k)).toByte
        k += 1
      }
      out(pos) = b
      if (pos + 1 < m) {
        h1 = (h1 - a1(pos) * p1) * B1 + a1(pos + width)
        h2 = (h2 - a2(pos) * p2) * B2 + a2(pos + width)
      }
      pos += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private[functions] def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private[functions] def toHex(d: Array[Byte]): UTF8String = {
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexChars((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** MOSS winnowing selection: md5 every `k`-token window, slide a window
    * of `w` consecutive digests, keep each window's minimum, dedup
    * (first-occurrence order, like `array_distinct`). Digests are computed
    * ONCE — the declarative two-layer HOF form re-evaluates the whole
    * n-digest transform inside every window's `slice` after Catalyst
    * collapses the projections, going O(n²·md5) per document (measured
    * 173 s for the query at sf0.1; this loop runs it in well under a
    * second). Returns null for a null token or fewer than w windows. */
  def winnow(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1 // number of k-gram digests
    if (m < w) return null
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      words(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val digests = new Array[Array[Byte]](m)
    val buf = new java.io.ByteArrayOutputStream(256)
    i = 0
    while (i < m) {
      buf.reset()
      var j = 0
      while (j < k) {
        if (j > 0) buf.write(' ')
        buf.write(words(i + j), 0, words(i + j).length)
        j += 1
      }
      digests(i) = Md5Pool.get().digest(buf.toByteArray)
      i += 1
    }
    val seen = new java.util.HashSet[java.math.BigInteger]()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var j = 0
    while (j <= m - w) {
      var best = digests(j)
      var t = 1
      while (t < w) {
        if (unsignedLess(digests(j + t), best)) best = digests(j + t)
        t += 1
      }
      if (seen.add(new java.math.BigInteger(1, best))) out += toHex(best)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }
}

/** [[WindowMd5Util.winnow]] as a map-side expression (§2.5 preference (b),
  * added r6): per-window minima of k-gram digests, deduped — the MOSS
  * winnowing fingerprint SET. Null semantics mirror [[MinWindowMd5]]. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any =
    WindowMd5Util.winnow(a.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("fps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $fp =
         |  graft.functions.WindowMd5Util.winnow($a, $k, $w);
         |if ($fp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum md5 over every `width`-token window of an `array<string>` column
  * as a single map-side expression (SURVEY §2.5 preference (b)) — third
  * instance of the text-hash rewrite: the HOF form interprets two lambda
  * layers (slice + array_join allocation, then md5) per window; this is one
  * tight loop per document with a reused StringBuilder and thread-local
  * digest.
  *
  * Null semantics: null array ⇒ NULL (nullIntolerant); null token or fewer
  * than `width` tokens ⇒ NULL — the query surface filters to ≥ width tokens
  * and split() never yields null tokens. */
case class MinWindowMd5(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"width must be >= 1: $width")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "min_window_md5"

  override def nullSafeEval(a: Any): Any =
    WindowMd5Util.minWindowMd5(a.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("fp")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $fp =
         |  graft.functions.WindowMd5Util.minWindowMd5($a, $width);
         |if ($fp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[WindowMd5Util.rollingWindowHashes]] as a map-side expression (§2.5
  * preference (b), added r10): every window fingerprint of the document in
  * one rolling pass — the Rabin-Karp production path for dedup_substrings
  * (cited in its Scale-shape note since r9). Null semantics mirror
  * [[MinWindowMd5]]. */
case class RollingWindowHashes(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"width must be >= 1: $width")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_window_hashes"

  override def nullSafeEval(a: Any): Any =
    WindowMd5Util.rollingWindowHashes(a.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val fp = ctx.freshName("rwh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $fp =
         |  graft.functions.WindowMd5Util.rollingWindowHashes($a, $width);
         |if ($fp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowMd5Functions {
  /** Column-API entry point. */
  def minWindowMd5(toks: Column, width: Int): Column =
    Bridge.column(MinWindowMd5(Bridge.expression(toks), width))

  /** Column-API entry point for the rolling window fingerprints. */
  def rollingWindowHashes(toks: Column, width: Int): Column =
    Bridge.column(RollingWindowHashes(Bridge.expression(toks), width))

  /** Column-API entry point for the winnowing fingerprint set. */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(toks), k, w))
}

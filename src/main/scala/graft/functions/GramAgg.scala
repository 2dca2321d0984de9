package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact Gram matrix accumulator (SURVEY §2.5 typed-aggregator
  * tier, the TopK pattern applied to linear algebra).
  *
  * The declarative Gram — posexplode + vec_id self-join + (i, j) hash agg —
  * is semantically right but pays a 64²× row blowup through the join and a
  * corpus×4096-row hash-aggregate update stream (measured: the whole of
  * embedding_pca_power's ~4 s at sf0.1). This aggregator folds each
  * vector's outer product into a single 64×64 long buffer per map task in
  * one tight loop (upper triangle only — the Gram is symmetric — mirrored
  * at finish), so the shuffle carries one 4096-long buffer per partition
  * and the CPU does exactly n·d(d+1)/2 multiply-adds. Same exact integer
  * arithmetic as the join form: elements micro-quantized to
  * floor(x·1e6) longs, products and sums exact in Int64 (overflow bound:
  * |q| ≤ 2²², so ~2⁴⁴ per product — safe past 10⁸ vectors per partition;
  * go DECIMAL downstream, as the callers already do).
  *
  * Dimension is taken from the first vector seen and enforced uniform —
  * the callers' oracles assume a rectangular table (`range(1, 65)`); a
  * ragged table should fail loudly here, not silently mis-sum.
  */
object GramAgg {

  final class GramAggregator extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], emb: Seq[Float]): Array[Long] = {
      if (emb == null) return buf
      val n = emb.length
      val b = if (buf.isEmpty) new Array[Long](n * n + 1) else buf
      // slot 0 stores the dimension (buffers start empty, so the merge
      // can't otherwise tell a 0-dim buffer from an unseen one)
      if (b(0) == 0L) b(0) = n.toLong
      require(b(0) == n.toLong,
        s"ragged embedding table: saw dimensions ${b(0)} and $n")
      val q = new Array[Long](n)
      var i = 0
      while (i < n) { q(i) = math.floor(emb(i).toDouble * 1000000.0).toLong; i += 1 }
      i = 0
      while (i < n) {
        val qi = q(i)
        var j = i
        while (j < n) { b(1 + i * n + j) += qi * q(j); j += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a(0) == b(0), s"ragged embedding table: dims ${a(0)} vs ${b(0)}")
        var i = 1
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

    override def finish(buf: Array[Long]): Seq[Long] = {
      if (buf.isEmpty) return Seq.empty
      val n = buf(0).toInt
      val out = new Array[Long](n * n)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          out(i * n + j) = if (j >= i) buf(1 + i * n + j) else buf(1 + j * n + i)
          j += 1
        }
        i += 1
      }
      out.toSeq
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** DataFrame-facing UDAF: `gramMicro(col("embedding"))` → array<bigint>
    * of length d², row-major. */
  val gramMicro: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new GramAggregator, ExpressionEncoder[Seq[Float]]())
}

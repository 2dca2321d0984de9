package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.4 / north-star).
  *
  * Media payloads are opaque `binary` columns with typed metadata extracted
  * by a batch decode step. This container has no image/audio libraries, so
  * [[decodeStub]] is a clearly-marked deterministic fake — the REAL parts
  * are the Spark plumbing this module exercises: binary columns flowing
  * through the plan, a `mapPartitions` batch-decode boundary (the shape a
  * JNI/FFmpeg/Pillow bridge needs: per-partition init, iterator in/out, no
  * per-row setup), and a typed `Dataset[MediaFeature]` result.
  */
object MultimodalFunctions {

  /** Typed metadata the decode stage emits. */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      fake_width: Int,
      fake_height: Int,
      channels: Int,
      sharpness: Double)

  /** STUB decoder — deterministic fake standing in for a real media decode.
    * Derives all features purely from the bytes so the operator is
    * oracle-checkable; a real deployment replaces this one function with
    * the native decoder and everything around it is unchanged. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    val head = bytes.take(64)
    var sum = 0
    var i = 0
    while (i < head.length) { sum += head(i) & 0xff; i += 1 }
    MediaFeature(
      doc_id = id,
      n_bytes = bytes.length,
      fake_width = bytes.length % 640,
      fake_height = bytes.length % 480,
      channels = 3,
      sharpness = sum / 64.0 / 255.0)
  }

  /** Batch decode: binary column in, typed features out, one decoder
    * instance per partition (where a real codec would allocate its native
    * context once per task, not per row). */
  def decodeFeatures(docs: DataFrame): Dataset[MediaFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (native context, model, …)
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}

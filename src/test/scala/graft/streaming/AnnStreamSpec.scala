package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** annStream (r15): streaming ANN serving against a static IVF index.
  * Contract: per-micro-batch top-k per query ≡ the batch ivf_topk rows for
  * the same query set — the twin uses the SAME index frames
  * (AnnQueries.ivfLists / ivfCentroids) and the same codegen cosine, so
  * stream and batch provably cannot drift. */
class AnnStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def batchExpected() =
    graft.SparkEntry.queries("ivf_topk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

  test("annStream in batch mode == ivf_topk") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = PriorityStreams.annStream(
        queries,
        graft.queries.AnnQueries.ivfLists(emb),
        graft.queries.AnnQueries.ivfCentroids(emb))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.nonEmpty)
    assert(got.toSeq == batchExpected().toSeq)
  }

  test("annStream over a real stream: two micro-batches of queries, update mode") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val qRows = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val served = PriorityStreams.annStream(
      mem.toDF().select(col("_1").as("qid"), col("_2").cast("array<float>").as("qv")),
      graft.queries.AnnQueries.ivfLists(emb),
      graft.queries.AnnQueries.ivfCentroids(emb))
    val query = served.writeStream
      .format("memory").queryName("ann_stream_out")
      .outputMode("update")
      .start()
    try {
      mem.addData(qRows.take(2).toSeq)
      query.processAllAvailable()
      mem.addData(qRows.drop(2).toSeq)
      query.processAllAvailable()
      val got = spark.table("ann_stream_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4))
      assert(got.toSeq == batchExpected().toSeq,
        "streamed serving must equal the batch retriever on the same queries")
    } finally query.stop()
  }
}

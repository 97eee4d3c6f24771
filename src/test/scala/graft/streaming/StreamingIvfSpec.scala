package graft.streaming

import graft.SparkSpec
import graft.ops.{Similarity, T}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingest into the persisted IVF index: a vector stream
  * drains through `foreachBatch -> Similarity.ivfAppend`, each
  * micro-batch assigned against the index's frozen quantizer
  * (map-only, O(batch)) and appended in place — the continuous form
  * of the daily-ingest contract `ns_knn_ivf_append` pins in batch.
  * The proof is equivalence: after the stream drains, probing the
  * streamed index returns exactly what probing a batch-built
  * base+appended index returns.
  */
/** Top-level so deserializing `.as[Vec]` needs no outer scope. */
final case class Vec(vec_id: Long, embedding: Seq[Float])

class StreamingIvfSpec extends SparkSpec {

  test("foreachBatch ivfAppend ingest == batch-built index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = T(spark, sf, "embeddings")
    val base = emb.filter(col("vec_id") < 300)
    val rest = emb.filter(col("vec_id") >= 300)
      .select(col("vec_id"), col("embedding"))
      .as[Vec].collect().sortBy(_.vec_id)

    val streamedIdx = java.nio.file.Files
      .createTempDirectory("graft-ivf-stream").toString
    val batchIdx = java.nio.file.Files
      .createTempDirectory("graft-ivf-batch").toString

    // reference: one build + one append, all in batch
    Similarity.ivfBuild(base, batchIdx)
    Similarity.ivfAppend(emb.filter(col("vec_id") >= 300), batchIdx)

    // streamed: same build, then the rest arrives as micro-batches
    Similarity.ivfBuild(base, streamedIdx)
    val stream = MemoryStream[Vec]
    val query = stream.toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) Similarity.ivfAppend(b, streamedIdx)
        ()
      }
      .start()
    try {
      val (firstHalf, secondHalf) = rest.splitAt(rest.length / 2)
      stream.addData(firstHalf.toSeq)
      query.processAllAvailable()
      stream.addData(secondHalf.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def probe(dir: String) =
      Similarity.ivfQuery(queries, dir, 3, 2)
        .collect().map(_.toSeq).toSeq
    val streamed = probe(streamedIdx)
    val batch = probe(batchIdx)
    assert(streamed == batch,
      s"streamed and batch-built indexes disagree: " +
        s"${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
    // appended vectors are genuinely searchable: some result rows must
    // come from the streamed range
    assert(streamed.exists(r =>
      r(2).asInstanceOf[Long] >= 300L),
      "no appended vector reachable from the probes")
  }
}

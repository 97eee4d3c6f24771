package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING keep-best ingest (round-17 verdict #7): the quality-
  * arbitrated replace — probe the standing LSH index, displace
  * lower-quality standing docs, keep the winners, and propagate every
  * replacement to the BM25 retrieval index — run per micro-batch over
  * a document stream, closing the last batch/streaming asymmetry
  * (DedupStream only did bucket-ownership dedup; replacements existed
  * only in the batch loop).
  *
  * Architecture: foreachBatch driving the SAME cross-index
  * transaction body as the batch loop
  * ([[graft.ops.Pipeline.kbApplyBatch]]), with the micro-batch EPOCH
  * as the transaction id. A state-store port (transformWithState)
  * cannot be the commit point here — the replace must land as atomic
  * snapshot commits on TWO standing tables, and exactly-once for
  * table commits is the app-scoped txn-watermark pattern the
  * streaming sink already established ([[ManifestSink]]): a
  * re-delivered epoch after a crash or restart replays the same id
  * against both indexes and heals whatever half was missing —
  * including the torn between-commits window, via the write-ahead
  * intent. The per-batch cost is the gated O(batch) probe + two
  * O(batch) commits, identical to the batch loop; state is the
  * standing indexes themselves, not a state store, so a restart needs
  * no state rebuild.
  *
  * The standing indexes must be bootstrapped (built over the base
  * corpus) before the stream starts — same contract as the loop.
  */
object KeepBestStream {

  /** Start the ingest over a streaming `(doc_id, text)` frame.
    * Decisions and replacements land in the standing indexes under
    * `dir`; the returned query is the handle to stop/await.
    */
  def start(docs: DataFrame, dir: String, checkpoint: String,
      minSim: Double = 0.5,
      app: String = "graft-kb-stream"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        // no gate here: the >=3-token short-doc gate lives INSIDE
        // kbApplyBatch so the stream and the batch loop apply ONE
        // identical filter (round-18 advisor)
        graft.ops.Pipeline.kbApplyBatch(
          b.select(col("doc_id"),
            split(col("text"), " ").as("toks")),
          dir, epoch, minSim, app)
      }
      .start()

  /** The fixture loop ACTUALLY STREAMED — the oracle-checked form
    * (`st_corpus_keep_best`): the three loop batches feed a
    * MemoryStream as three real micro-batch epochs through [[start]],
    * and the returned probe over the post-replacement standing corpus
    * shares [[graft.ops.Pipeline.corpusKeepBestBm25Oracle]] with the
    * batch loop — the stream and the loop are the same transaction
    * body, so they must score identically. The driver-side collect
    * feeding the MemoryStream is the fixture-source shape (a memory
    * stream's input is driver-fed by definition); production streams
    * arrive from a real source and never transit the driver.
    */
  def runLoopFixture(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, dir: String, minSim: Double = 0.5,
      nTerms: Int = 10, k: Int = 3,
      masterDir: Option[String] = None,
      corpusId: Option[String] = None): DataFrame = {
    import graft.ops.{Bm25Index, Dedup}
    import spark.implicits._
    val base = Dedup.incrLoopBase(docs)
    val baseText = base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text"))
    masterDir match {
      case Some(m) =>
        // one shared stale-master identity — caller-supplied (zero
        // jobs) or a single content-fingerprint scan for BOTH tables
        val id = Some(corpusId.getOrElse(Dedup.corpusFingerprint(base)))
        Dedup.lshIndexFresh(base, s"$m/lsh", s"$dir/lsh", id)
        Bm25Index.fresh(baseText, s"$m/bm25", s"$dir/bm25", id)
      case None =>
        Dedup.lshIndexBuild(base, s"$dir/lsh")
        Bm25Index.build(baseText, s"$dir/bm25")
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = start(stream.toDF().toDF("doc_id", "text"), dir,
      s"$dir/ckpt", minSim)
    try {
      (1 to Dedup.IncrLoopBatches).foreach { b =>
        stream.addData(Dedup.incrLoopBatch(docs, b)
          .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq): Unit
        q.processAllAvailable()
      }
    } finally q.stop()
    Bm25Index.topDocs(spark, s"$dir/bm25", nTerms, k)
  }
}

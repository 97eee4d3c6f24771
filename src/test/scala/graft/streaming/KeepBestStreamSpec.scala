package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{Bm25Index, Dedup, Manifest, Pipeline, T}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming keep-best ingest (round-17 verdict #7): the three loop
  * batches fed as three micro-batches, with a kill injected BETWEEN
  * the LSH and BM25 commits of the middle epoch and a restart from
  * the same checkpoint — the final standing state must be bit-equal
  * to the uninterrupted BATCH loop over the same data.
  */
class KeepBestStreamSpec extends SparkSpec {

  final case class Doc(doc_id: Long, text: String)

  private def docs = T(spark, sf, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def batchDocs(k: Int): Seq[Doc] =
    Dedup.incrLoopBatch(docs, k)
      .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
      .collect().map(r => Doc(r.getLong(0), r.getString(1))).toSeq

  test("kill/restart soak with replacements: final state bit-equal to the batch loop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference: the uninterrupted batch loop on its own dir
    val dirB = Files.createTempDirectory("graft-kbs-batch").toString
    val ref = rows(Pipeline.corpusKeepBestBm25(docs, dirB))

    // streaming dir: same bootstrap the loop performs
    val dirS = Files.createTempDirectory("graft-kbs-stream").toString
    val ckpt = Files.createTempDirectory("graft-kbs-ckpt").toString
    val base = Dedup.incrLoopBase(docs)
    Dedup.lshIndexBuild(base, s"$dirS/lsh")
    Bm25Index.build(base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text")), s"$dirS/bm25")

    val stream = MemoryStream[Doc]
    val app = "graft-kb-stream"
    // arm the kill BEFORE the query starts: the micro-batch engine
    // runs under a session CLONE whose conf snapshots at start, so a
    // mid-run set would be invisible. Epoch 0 passes (b=0 != "1");
    // epoch 1 dies between its two commits — the torn window.
    spark.conf.set(Pipeline.KbCrashConf, "1")
    val q1 = KeepBestStream.start(stream.toDF(), dirS, ckpt, app = app)
    try {
      stream.addData(batchDocs(1))
      q1.processAllAvailable()
      assert(Manifest.lastTxnFor(spark, s"$dirS/lsh/bands", app)
        .contains(0L))
      stream.addData(batchDocs(2))
      intercept[Exception] { q1.processAllAvailable() }
      assert(q1.exception.isDefined, "the injected crash must kill the query")
    } finally {
      spark.conf.unset(Pipeline.KbCrashConf)
      q1.stop()
    }
    // torn state is real: LSH has epoch 1, BM25 only epoch 0
    assert(Manifest.lastTxnFor(spark, s"$dirS/lsh/bands", app)
      .contains(1L))
    assert(Manifest.lastTxnFor(spark, s"$dirS/bm25/index", app)
      .contains(0L))

    // restart from the SAME checkpoint: foreachBatch re-delivers epoch
    // 1 (same id, same data), the txn protocol heals the BM25 half
    // from the intent, and epoch 2 streams through normally
    val q2 = KeepBestStream.start(stream.toDF(), dirS, ckpt, app = app)
    try {
      q2.processAllAvailable()
      stream.addData(batchDocs(3))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(Manifest.lastTxnFor(spark, s"$dirS/bm25/index", app)
      .contains(2L))
    val got = rows(Bm25Index.topDocs(spark, s"$dirS/bm25", 10, 3))
    assert(got == ref,
      "streaming ingest must end bit-equal to the batch loop")
    // (the batch loop's output is itself oracle-pinned against a
    // from-scratch DuckDB recompute — ns_corpus_bm25_keep_best — so
    // this equality transitively pins the stream against the oracle)
  }
}

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

    // INTENT RECLAMATION (round-18 verdict #1): every epoch's intent
    // holds the winners' full text; a long-running stream writing one
    // per micro-batch used to accumulate a second copy of the corpus
    // forever. After the soak — crash, restart, re-delivery and all —
    // the txn/ tree must hold NO fully-applied intent (each epoch
    // retires its own, and stragglers from the crash are swept by the
    // next epoch's retire pass).
    val fs = new org.apache.hadoop.fs.Path(dirS).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dirS/txn"))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName).toSeq
    assert(leftovers.isEmpty,
      s"all epochs are applied to both indexes, yet intents remain: " +
        leftovers.mkString(", "))
  }

  test("FILE-SOURCE stream: kill mid-epoch, restart from checkpoint, bit-equal") {
    // round-18 verdict #6: the MemoryStream fixture proves the
    // transaction body; the production claim — "state is the standing
    // indexes, restart rebuilds nothing" — deserves a REAL source.
    // Batches arrive as parquet file drops; maxFilesPerTrigger=1 makes
    // one file = one epoch; the kill lands between epoch 1's two
    // commits (inside the epoch, not at its boundary), and the
    // restarted query re-delivers the same file under the same epoch
    // id from the file source's own log.
    val dirB = Files.createTempDirectory("graft-kbf-batch").toString
    val ref = rows(Pipeline.corpusKeepBestBm25(docs, dirB))

    val dirS = Files.createTempDirectory("graft-kbf-stream").toString
    val ckpt = Files.createTempDirectory("graft-kbf-ckpt").toString
    val drop = Files.createTempDirectory("graft-kbf-drop").toString
    val base = Dedup.incrLoopBase(docs)
    Dedup.lshIndexBuild(base, s"$dirS/lsh")
    Bm25Index.build(base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text")), s"$dirS/bm25")

    def dropBatch(k: Int): Unit =
      Dedup.incrLoopBatch(docs, k)
        .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
        .coalesce(1).write.mode("append").parquet(drop)
    def fileStream() = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(drop)

    val app = "graft-kb-fstream"
    dropBatch(1)
    spark.conf.set(Pipeline.KbCrashConf, "1")
    val q1 = KeepBestStream.start(fileStream(), dirS, ckpt, app = app)
    try {
      q1.processAllAvailable() // epoch 0 = batch 1, passes
      assert(Manifest.lastTxnFor(spark, s"$dirS/bm25/index", app)
        .contains(0L))
      dropBatch(2)
      intercept[Exception] { q1.processAllAvailable() }
      assert(q1.exception.isDefined,
        "the injected mid-epoch crash must kill the query")
    } finally {
      spark.conf.unset(Pipeline.KbCrashConf)
      q1.stop()
    }
    // the tear is inside epoch 1: LSH applied, BM25 one epoch behind
    assert(Manifest.lastTxnFor(spark, s"$dirS/lsh/bands", app)
      .contains(1L))
    assert(Manifest.lastTxnFor(spark, s"$dirS/bm25/index", app)
      .contains(0L))

    // restart: the file source re-offers batch 2's file as epoch 1,
    // the BM25 half rolls forward from the intent; then batch 3 drops
    val q2 = KeepBestStream.start(fileStream(), dirS, ckpt, app = app)
    try {
      q2.processAllAvailable()
      dropBatch(3)
      q2.processAllAvailable()
    } finally q2.stop()

    assert(Manifest.lastTxnFor(spark, s"$dirS/bm25/index", app)
      .contains(2L))
    assert(rows(Bm25Index.topDocs(spark, s"$dirS/bm25", 10, 3)) == ref,
      "the file-fed stream must end bit-equal to the batch loop")
  }
}

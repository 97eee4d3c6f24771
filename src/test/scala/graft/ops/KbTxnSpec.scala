package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The keep-best loop's CROSS-INDEX ingest transaction (round-17
  * verdict #1): per batch, the LSH replace commit and the BM25
  * replace commit are stamped with one `(loopApp, batchId)` txn
  * watermark, and the loop writes a durable INTENT (displaced ids +
  * winners' text) before either commit. A crash BETWEEN the two
  * commits — which used to strand the displaced docs' postings live
  * in the retrieval index forever — now heals on restart: the LSH
  * watermark shows the batch applied, and the BM25 half rolls forward
  * from the intent, ending bit-equal to the uninterrupted run.
  */
class KbTxnSpec extends SparkSpec {

  private def docs = T(spark, sf, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("kill between the LSH and BM25 commits; restart ends bit-equal") {
    val dirA = Files.createTempDirectory("graft-kbtxn-a").toString
    val dirB = Files.createTempDirectory("graft-kbtxn-b").toString

    // reference: the uninterrupted loop
    val ref = rows(Pipeline.corpusKeepBestBm25(docs, dirA))

    // crashed run: die right after batch 2's LSH commit
    spark.conf.set(Pipeline.KbCrashConf, "2")
    val e = intercept[IllegalStateException] {
      Pipeline.corpusKeepBestBm25(docs, dirB)
    }
    assert(e.getMessage.contains("injected crash"))
    spark.conf.unset(Pipeline.KbCrashConf)

    // the torn window is REAL: LSH says batch 2 applied, BM25 says 1
    assert(Manifest.lastTxnFor(spark, s"$dirB/lsh/bands",
      Pipeline.KbTxnApp).contains(2L))
    assert(Manifest.lastTxnFor(spark, s"$dirB/bm25/index",
      Pipeline.KbTxnApp).contains(1L))
    // and the displaced docs' postings ARE still live in the torn
    // index (the bug the transaction exists to prevent): the intent
    // records batch 2's doomed ids, none tombstoned yet
    val doomed2 = spark.read.parquet(s"$dirB/txn/batch=2")
      .filter(col("role") === "doom").select("doc_id")
    if (doomed2.count() > 0)
      assert(Manifest.readTable(spark, s"$dirB/bm25/index")
        .filter(col("kind") === "del")
        .join(doomed2, Seq("doc_id"), "left_semi").count() == 0,
        "before recovery the doomed docs must be un-tombstoned")

    // restart the SAME loop on the same dir: batch 2's BM25 half rolls
    // forward from the intent, batch 3 runs normally — bit-equal
    val healed = rows(Pipeline.corpusKeepBestBm25(docs, dirB))
    assert(healed == ref,
      "the healed run must be bit-equal to the uninterrupted run")
    assert(Manifest.lastTxnFor(spark, s"$dirB/bm25/index",
      Pipeline.KbTxnApp).contains(3L))

    // DOUBLE restart: every batch replay-skips, result unchanged, and
    // neither index commits a new version
    val vLsh = Manifest.currentVersion(spark, s"$dirB/lsh/bands")
    val vBm = Manifest.currentVersion(spark, s"$dirB/bm25/index")
    assert(rows(Pipeline.corpusKeepBestBm25(docs, dirB)) == ref)
    assert(Manifest.currentVersion(spark, s"$dirB/lsh/bands") == vLsh,
      "a fully-applied loop must not re-commit the LSH index")
    assert(Manifest.currentVersion(spark, s"$dirB/bm25/index") == vBm,
      "a fully-applied loop must not re-commit the BM25 index")
  }

  test("a FIRST-batch tear (no prior BM25 watermark) heals too") {
    val dirA = Files.createTempDirectory("graft-kbtxn2-a").toString
    val dirB = Files.createTempDirectory("graft-kbtxn2-b").toString
    val ref = rows(Pipeline.corpusKeepBestBm25(docs, dirA))

    // crash after batch 1's LSH commit: the BM25 index has NO loop
    // watermark at all yet — recovery must roll batch 1 forward from
    // the intent, then run 2 and 3 normally
    spark.conf.set(Pipeline.KbCrashConf, "1")
    intercept[IllegalStateException] {
      Pipeline.corpusKeepBestBm25(docs, dirB)
    }
    spark.conf.unset(Pipeline.KbCrashConf)
    assert(rows(Pipeline.corpusKeepBestBm25(docs, dirB)) == ref)
  }
}

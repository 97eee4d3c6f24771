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

    // INTENT RECLAMATION (round-18 verdict #1): after the heal, every
    // batch is applied to both indexes, so no intent — including the
    // crash's batch=2 straggler — may remain; only the lease-less
    // txn/ shell is left
    for (d <- Seq(dirA, dirB)) {
      val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val left = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/txn"))
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName).toSeq
      assert(left.isEmpty, s"$d retains applied intents: " +
        left.mkString(", "))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/txn/_lease")),
        s"$d's ingest lease must be released after the loop")
    }
  }

  test("the >=3-token gate lives in the TRANSACTION BODY, not one ingest form") {
    // round-18 advisor: the stream filtered short docs and the batch
    // loop didn't — identical input could diverge between the two.
    // Feed a batch containing a 2-token doc straight into the shared
    // body: it must not enter either index, from any caller.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kbtxn-gate").toString
    val base = Dedup.incrLoopBase(docs)
    Dedup.lshIndexBuild(base, s"$dir/lsh")
    Bm25Index.build(base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text")), s"$dir/bm25")
    val batch = Seq(
      (900001L, Seq("tiny", "doc")),
      (900002L, Seq("a", "proper", "three", "token", "document")))
      .toDF("doc_id", "toks")
    Pipeline.kbApplyBatch(batch, dir, 1L, 0.5, "graft-kb-gate-test")
    val indexed = Manifest.readTable(spark, s"$dir/bm25/index")
      .filter(col("kind") === "post" &&
        col("doc_id").isin(900001L, 900002L))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(900002L),
      s"the short doc must be gated out in kbApplyBatch itself: $indexed")
  }

  test("a concurrent writer fails FAST on the ingest lease") {
    // round-18 verdict #7: a SECOND loop on the same dir would
    // silently interleave intent overwrites before any snapshot
    // commit collides — the per-batch lease makes it fail loudly
    val dir = Files.createTempDirectory("graft-kbtxn-lease").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(s"$dir/txn/_lease")
    fs.mkdirs(lease.getParent)
    val out = fs.create(lease, false)
    out.write("other-writer".getBytes("UTF-8")); out.close()

    val e = intercept[java.util.ConcurrentModificationException] {
      Pipeline.corpusKeepBestBm25(docs, dir)
    }
    assert(e.getMessage.contains("write lease"), e.getMessage)

    // the other writer finishing (lease released) unblocks this one
    fs.delete(lease, false)
    val ref = rows(Pipeline.corpusKeepBestBm25(
      docs, Files.createTempDirectory("graft-kbtxn-lease-ref").toString))
    assert(rows(Pipeline.corpusKeepBestBm25(docs, dir)) == ref)
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

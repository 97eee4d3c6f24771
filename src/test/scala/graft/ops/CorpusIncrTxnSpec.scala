package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pipeline.corpusBuildIncr]]'s cross-TABLE transaction (round 18):
  * the loop maintains THREE standing tables per batch — hashes, the
  * LSH band index, and (with withBm25) the BM25 retrieval index. A
  * crash between the three appends used to leave them describing
  * different corpora, and a naive re-run would re-derive survivors
  * against the half-advanced state (the re-probe of already-appended
  * hashes drops every batch doc as a standing dup). Now each batch
  * writes a durable intent and stamps all three commits with one
  * `(app, k)` watermark: a restart rolls the missing halves forward
  * from the intent and the audit row reports the ORIGINAL counts.
  */
class CorpusIncrTxnSpec extends SparkSpec {

  private def docs = T(spark, sf, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("crash between the hash and LSH commits; restart ends bit-equal") {
    val dirA = Files.createTempDirectory("graft-citxn-a").toString
    val dirB = Files.createTempDirectory("graft-citxn-b").toString
    val refAudit = rows(Pipeline.corpusBuildIncr(docs, dirA,
      withBm25 = true))
    val refProbe = rows(Bm25Index.topDocs(spark, s"$dirA/bm25", 10, 3))

    // die after batch 2's hashes commit — LSH and BM25 behind
    spark.conf.set(Pipeline.CiCrashConf, "2:h")
    val e = intercept[IllegalStateException] {
      Pipeline.corpusBuildIncr(docs, dirB, withBm25 = true)
    }
    assert(e.getMessage.contains("injected crash"))
    spark.conf.unset(Pipeline.CiCrashConf)
    // the tear is real: hashes at batch 2, band index + BM25 at 1
    assert(Manifest.lastTxnFor(spark, s"$dirB/hashes",
      Pipeline.CiTxnApp).contains(2L))
    assert(Manifest.lastTxnFor(spark, s"$dirB/lsh/bands",
      Pipeline.CiTxnApp).contains(1L))
    assert(Manifest.lastTxnFor(spark, s"$dirB/bm25/index",
      Pipeline.CiTxnApp).contains(1L))

    // restart: batch 2's LSH+BM25 halves roll forward from the
    // intent (audit counts come from the intent sidecar, NOT a
    // recount against the advanced hash table), batch 3 runs fresh
    assert(rows(Pipeline.corpusBuildIncr(docs, dirB,
      withBm25 = true)) == refAudit)
    assert(rows(Bm25Index.topDocs(spark, s"$dirB/bm25", 10, 3))
      == refProbe)

    // a THIRD run replays every batch as a no-op: same audit, and no
    // table commits a new version
    val vs = Seq(s"$dirB/hashes", s"$dirB/lsh/bands", s"$dirB/bm25/index")
      .map(Manifest.currentVersion(spark, _))
    assert(rows(Pipeline.corpusBuildIncr(docs, dirB,
      withBm25 = true)) == refAudit)
    assert(Seq(s"$dirB/hashes", s"$dirB/lsh/bands", s"$dirB/bm25/index")
      .map(Manifest.currentVersion(spark, _)) == vs,
      "a fully-applied loop must not re-commit any standing table")

    // INTENT RECLAMATION (round-18 verdict #1): fully-applied intents'
    // DATA dirs (kept docs' full text) are reclaimed inline; the
    // one-line .counts audit sidecars stay — that third replayed run
    // above reported the ORIGINAL counts from them
    for (d <- Seq(dirA, dirB)) {
      val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val entries = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/txn"))
        .map(st => (st.getPath.getName, st.isDirectory)).toSeq
      assert(!entries.exists { case (n, isDir) =>
        isDir && n.startsWith("batch=") },
        s"$d retains applied intent data: $entries")
      assert((1 to Pipeline.CorpusIncrBatches).forall(k =>
        entries.contains((s"batch=$k.counts", false))),
        s"the audit sidecars must survive reclamation: $entries")
    }

    // a crashed straggler no inline pass ever reached is the VACUUM
    // backstop's job: plant one below the watermarks and one above
    val fsB = new org.apache.hadoop.fs.Path(dirB).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    docs.limit(1).write.parquet(s"$dirB/txn/batch=0")
    docs.limit(1).write.parquet(s"$dirB/txn/batch=99")
    assert(Pipeline.vacuumIntents(spark, dirB) == 1,
      "vacuum must reclaim exactly the fully-applied straggler")
    assert(!fsB.exists(new org.apache.hadoop.fs.Path(s"$dirB/txn/batch=0")))
    assert(fsB.exists(new org.apache.hadoop.fs.Path(s"$dirB/txn/batch=99")),
      "an intent AHEAD of a table's watermark must survive the vacuum")
  }

  test("crash between the LSH and BM25 commits heals the same way") {
    val dirA = Files.createTempDirectory("graft-citxn2-a").toString
    val dirB = Files.createTempDirectory("graft-citxn2-b").toString
    val refAudit = rows(Pipeline.corpusBuildIncr(docs, dirA,
      withBm25 = true))
    val refProbe = rows(Bm25Index.topDocs(spark, s"$dirA/bm25", 10, 3))

    spark.conf.set(Pipeline.CiCrashConf, "1:lsh")
    intercept[IllegalStateException] {
      Pipeline.corpusBuildIncr(docs, dirB, withBm25 = true)
    }
    spark.conf.unset(Pipeline.CiCrashConf)
    assert(Manifest.lastTxnFor(spark, s"$dirB/lsh/bands",
      Pipeline.CiTxnApp).contains(1L))
    assert(Manifest.lastTxnFor(spark, s"$dirB/bm25/index",
      Pipeline.CiTxnApp).isEmpty)

    assert(rows(Pipeline.corpusBuildIncr(docs, dirB,
      withBm25 = true)) == refAudit)
    assert(rows(Bm25Index.topDocs(spark, s"$dirB/bm25", 10, 3))
      == refProbe)
  }
}

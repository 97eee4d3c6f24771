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

package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retention drill for the MUTABLE standing indexes (round-17 verdict
  * #6): a keep-best ingest loop leaves superseded snapshots behind —
  * replace commits (DV dirs + band/posting deltas), tombstone flushes,
  * compactions, CDC records. Nothing before this spec drove
  * `Manifest.vacuum` against a loop-mutated index and proved the live
  * probe survives, out-of-retention time travel fails CLEANLY (an
  * error, not resurrected rows), and the orphaned DV/CDC metadata is
  * physically reclaimed.
  */
class IndexVacuumSpec extends SparkSpec {

  private def docs = T(spark, sf, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def mfDirs(table: String, prefix: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/_manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(prefix)).toSeq
  }

  test("vacuum a loop-mutated index pair: live probes unchanged, old versions fail cleanly, DV/CDC debris reclaimed") {
    val dir = Files.createTempDirectory("graft-vacdrill").toString
    // three replace cycles over both standing indexes
    val probe = rows(Pipeline.corpusKeepBestBm25(docs, dir))
    val lsh = s"$dir/lsh/bands"
    val bm = s"$dir/bm25/index"
    assert(Manifest.currentVersion(spark, lsh).exists(_ > 2) &&
      Manifest.currentVersion(spark, bm).exists(_ > 2),
      "the loop must leave real history")
    // the loop's replace commits leave DV dirs on the band table
    assert(mfDirs(lsh, "dv-v").nonEmpty,
      "fixture sanity: replaces must have written deletion vectors")
    val lshDecisions = rows(Dedup.dedupBatchVsIndex(
      Dedup.incrLoopBatch(docs, 1), s"$dir/lsh", 0.5))

    // the maintenance window: flush the band table's replace marks,
    // fold both indexes' per-append files — these SUPERSEDE files
    // (append-only commits never do), which is what vacuum reclaims
    Layout.flushDeleteVectors(spark, lsh)
    Dedup.lshIndexCompact(spark, s"$dir/lsh"): Unit
    Bm25Index.compact(spark, s"$dir/bm25"): Unit
    assert(rows(Bm25Index.topDocs(spark, s"$dir/bm25", 10, 3)) == probe,
      "maintenance must not change probe answers")

    val vLsh = Manifest.currentVersion(spark, lsh).get
    val vBm = Manifest.currentVersion(spark, bm).get
    val removedLsh = Manifest.vacuum(spark, lsh, keepVersions = 1)
    val removedBm = Manifest.vacuum(spark, bm, keepVersions = 1)
    assert(removedLsh + removedBm > 0,
      "a 3-cycle loop must leave superseded files to reclaim")

    // live reads are bit-identical after the reclaim
    assert(rows(Bm25Index.topDocs(spark, s"$dir/bm25", 10, 3)) == probe)
    assert(rows(Dedup.dedupBatchVsIndex(
      Dedup.incrLoopBatch(docs, 1), s"$dir/lsh", 0.5)) == lshDecisions)

    // out-of-retention time travel fails LOUDLY (the snapshot's data
    // files are gone), never resurrects partial state
    intercept[Exception] {
      Manifest.readTable(spark, bm, Some(1)).collect()
    }

    // DV + CDC dirs below the retention floor are physically gone
    val staleDv = mfDirs(lsh, "dv-v")
      .filter(_.stripPrefix("dv-v").toInt < vLsh)
    assert(staleDv.isEmpty, s"stale DV dirs survived vacuum: $staleDv")
    val staleCdc =
      mfDirs(lsh, "cdc-v").filter(_.stripPrefix("cdc-v").toInt < vLsh) ++
        mfDirs(bm, "cdc-v").filter(_.stripPrefix("cdc-v").toInt < vBm)
    assert(staleCdc.isEmpty, s"stale CDC dirs survived vacuum: $staleCdc")
    // spent claim tokens are gone too
    assert(mfDirs(lsh, "commit-v").isEmpty &&
      mfDirs(bm, "commit-v").isEmpty)

    // and the indexes stay MUTABLE after the drill: drain the loop's
    // pending tombstones, then one more delete + flush round-trips
    Bm25Index.flushDeletes(spark, s"$dir/bm25"): Unit
    val extra = Manifest.readTable(spark, bm)
      .filter(col("kind") === "post").select("doc_id").distinct().limit(5)
    val n = Bm25Index.delete(extra, s"$dir/bm25")
    assert(n > 0)
    assert(Bm25Index.flushDeletes(spark, s"$dir/bm25") == n)
  }
}

package graft.streaming

import graft.SparkSpec
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC replication end to end: an origin manifest table is
  * mutated through every verb; a replica seeded from v1 follows the
  * change feed and must equal the origin after each drain — including
  * across a restart, and through maintenance commits that stream
  * nothing.
  */
class CdcReplicatorSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-repl-$tag").toString

  private def fp(dir: String) =
    Layout.contentFingerprint(Manifest.readTable(spark, dir))
      .collect().toSeq

  test("a replica follows deletes, upserts, appends, and survives restart") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val src = tmp("src")
    val dst = tmp("dst")
    val ckpt = tmp("ckpt")

    docs.repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(src)
    Manifest.create(spark, src, Seq("doc_id"))                       // v1
    // seed the replica with the origin's v1 state
    Manifest.readTable(spark, src)
      .repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dst)
    Manifest.create(spark, dst, Seq("doc_id"))

    // origin mutates through the verb set
    Layout.deleteInPlace(spark, src,
      col("doc_id").between(50, 80), Seq("doc_id"))                  // v2
    Layout.upsertInPlace(spark, src,
      docs.filter(col("doc_id") % 111 === 0)
        .withColumn("text", concat(lit("u:"), col("text"))),
      "doc_id", Seq("doc_id"))                                       // v3
    Layout.appendInPlace(spark, src,
      docs.filter(col("doc_id") % 131 === 0)
        .withColumn("doc_id", col("doc_id") + 600000L),
      Seq("doc_id"))                                                 // v4

    // the replicator runs as a continuous stream; drive it with
    // processAllAvailable
    val q1 = CdcReplicator.start(spark, src, dst, "doc_id", ckpt,
      startingVersion = 1, statCols = Seq("doc_id"))
    q1.processAllAvailable()
    q1.stop()
    assert(fp(dst) == fp(src),
      "replica must equal origin after draining the feed")

    // maintenance on the origin streams nothing and changes nothing
    Layout.compactInPlace(spark, src, statCols = Seq("doc_id"))      // v5
    // more churn, then a RESTARTED replicator (same checkpoint) picks
    // up exactly the new windows; the second compaction consumes the
    // merge-on-read marks inline (rewriting verbs refuse over live
    // vectors) and stays silent in the feed
    Layout.deleteMergeOnRead(spark, src,
      col("doc_id").between(200, 210), Seq("doc_id"))                // v6
    Layout.compactInPlace(spark, src, statCols = Seq("doc_id"))      // v7
    Layout.upsertInPlace(spark, src,
      docs.filter(col("doc_id") === 3L)
        .withColumn("text", lit("final")), "doc_id", Seq("doc_id"))  // v8

    val q2 = CdcReplicator.start(spark, src, dst, "doc_id", ckpt,
      startingVersion = 1, statCols = Seq("doc_id"))
    q2.processAllAvailable()
    q2.stop()
    assert(fp(dst) == fp(src),
      "replica must converge after restart across maintenance + churn")
    // and the replica history shows only keyed applies, no rescans
    assert(Manifest.currentVersion(spark, dst).exists(_ >= 3))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Layout

/** STREAMING CDC REPLICATION between manifest tables — the capstone of
  * the change-feed stack: a replica follows an origin table by
  * consuming its per-commit change records
  * ([[graft.sources.ManifestSource]] with `changeFeed=true`) and
  * applying each micro-batch's NET effect per key with the keyed
  * verbs. Deletes, upserts, and appends on the origin all replicate;
  * maintenance commits (compaction, vector flush) stream zero rows
  * and cost the replica nothing.
  *
  * Batch application is ORDER-AWARE and idempotent:
  *  - within a batch (which may span several origin commits), each
  *    key's LAST change wins — ranked by `_commit_version`, with
  *    'insert' outranking 'delete' inside one commit so an upsert's
  *    delete+insert pair nets to the insert;
  *  - a replayed batch (restart between apply and checkpoint) re-nets
  *    to the same terminal state: [[Layout.deleteByKeys]] of absent
  *    keys and [[Layout.upsertInPlace]] of identical rows are both
  *    no-ops on the data, so exactly-once REPLICA STATE holds on
  *    at-least-once delivery — the standard keyed-CDC contract.
  *
  * Scale posture: each cycle costs O(changes) feed rows + O(affected
  * files) on the replica (both verbs plan through the replica's
  * manifest stats); the origin is never rescanned.
  */
object CdcReplicator {

  /** Apply one change-feed micro-batch to the replica at `dir`. */
  def applyBatch(dir: String, keyCol: String,
      statCols: Seq[String] = Nil)(batch: DataFrame, id: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // the last change per key wins; 'insert' > 'delete' orders the
    // upsert pair correctly within one commit
    val last = batch
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("_commit_version").desc,
            col("_change_type").desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .cache()
    try {
      val deletes = last.filter(col("_change_type") === "delete")
        .select(col(keyCol))
      val upserts = last.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
      if (!deletes.isEmpty)
        Layout.deleteByKeys(spark, dir, deletes, keyCol, statCols)
      if (!upserts.isEmpty)
        Layout.upsertInPlace(spark, dir, upserts, keyCol, statCols)
    } finally last.unpersist()
  }

  /** Start replicating `srcDir`'s changes into `dstDir` (which must
    * exist as a manifest table holding the origin's state as of the
    * stream's starting version — seed it with
    * [[graft.ops.Manifest.readTable]] + a fresh manifest, then pass
    * that version as `startingVersion`).
    */
  def start(spark: SparkSession, srcDir: String, dstDir: String,
      keyCol: String, checkpoint: String, startingVersion: Int,
      statCols: Seq[String] = Nil): StreamingQuery =
    spark.readStream.format("graft.sources.ManifestSource")
      .option("path", srcDir)
      .option("changeFeed", "true")
      .option("startingVersion", startingVersion.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(dstDir, keyCol, statCols)(b, id)
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Layout

/** Streaming ingestion into a manifest-managed table with EXACTLY-ONCE
  * semantics — the missing link between the streaming surface and the
  * layout layer.
  *
  * Structured Streaming's `foreachBatch` is at-least-once: after a
  * crash between sink write and checkpoint commit, the batch is
  * re-delivered with the SAME batchId. The sink therefore records the
  * batchId inside the manifest's atomic CURRENT write
  * ([[graft.ops.Manifest.lastTxn]], the Delta `txn` pattern): a replay
  * finds `lastTxn >= batchId` and no-ops, and because data visibility
  * and the txn record flip in the same pointer write there is no
  * partial state to reconcile. Maintenance commits (delete / compact /
  * upsert) carry the txn forward, so idempotence survives interleaved
  * OPTIMIZE runs.
  *
  * At 100 TB this is the nightly-ingest shape: each micro-batch costs
  * O(batch) staged writes plus one metadata swap, the table stays
  * time-travelable across batches, and small-file debt from frequent
  * triggers is retired by in-place compaction WITHOUT breaking the
  * replay guard.
  */
object ManifestSink {

  /** The `foreachBatch` body: idempotent append of one micro-batch.
    * `appId` scopes the replay watermark to THIS stream (Delta's
    * txnAppId pattern) — required when several streams append to one
    * table, where the global epoch max would silently no-op whichever
    * stream runs behind. A single-writer table can omit it.
    */
  def appendBatch(dir: String, statCols: Seq[String] = Nil,
      appId: Option[String] = None)(
      batch: Dataset[Row], batchId: Long): Unit =
    Layout.appendInPlace(batch.sparkSession, dir, batch.toDF(),
      statCols,
      // an explicit app suppresses the global txn: a behind-running
      // app stream must not lower the shared single-writer watermark
      txn = if (appId.isDefined) None else Some(batchId),
      txnApp = appId.map(_ -> batchId))

  /** Start a streaming append of `stream` into the manifest table at
    * `dir` (which must exist with at least one committed file — the
    * batch aligns to the table's schema).
    */
  def start(stream: DataFrame, dir: String, checkpoint: String,
      statCols: Seq[String] = Nil,
      appId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(appendBatch(dir, statCols, appId) _)
      .start()
}

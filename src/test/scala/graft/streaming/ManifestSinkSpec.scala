package graft.streaming

import graft.SparkSpec
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming appends into a manifest table: batches land
  * once, a crash-replayed batch is a no-op (the txn commits in the
  * same atomic pointer write as the data), and an interleaved
  * compaction neither loses rows nor re-opens the replay window.
  */
case class SinkDoc(doc_id: Long, source: String, text: String)

class ManifestSinkSpec extends SparkSpec {

  test("streamed batches append exactly once; replay and compaction are safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ck").toString

    // seed table: 10 committed rows
    (0L until 10L).map(i => SinkDoc(i, s"s${i % 3}", s"seed $i")).toDF()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.ensure(spark, dir, Seq("doc_id"))

    val stream = MemoryStream[SinkDoc]
    val query = ManifestSink.start(stream.toDF(), dir, ckpt,
      statCols = Seq("doc_id"))
    try {
      stream.addData((10L until 25L).map(i => SinkDoc(i, s"s${i % 3}", s"b1 $i")))
      query.processAllAvailable()
      stream.addData((25L until 40L).map(i => SinkDoc(i, s"s${i % 3}", s"b2 $i")))
      query.processAllAvailable()
    } finally query.stop()

    val afterStream = Manifest.readTable(spark, dir)
    assert(afterStream.count() == 40)
    assert(afterStream.select("doc_id").distinct().count() == 40)
    val txn = Manifest.lastTxn(spark, dir)
    assert(txn.contains(1L), s"last committed batchId should be 1: $txn")

    // crash replay: the same batchId re-delivered must be a no-op —
    // this is exactly what foreachBatch does after an uncommitted stop
    val replay = (25L until 40L).map(i => SinkDoc(i, s"s${i % 3}", s"b2 $i")).toDF()
    assert(Layout.appendInPlace(spark, dir, replay, Seq("doc_id"),
      txn = Some(1L)) == 0, "replayed batch must not append")
    assert(Manifest.readTable(spark, dir).count() == 40)

    // maintenance between batches: compaction must carry the txn
    // forward (or the NEXT replay window would reopen) and lose nothing
    Layout.compactInPlace(spark, dir, statCols = Seq("doc_id"))
    assert(Manifest.lastTxn(spark, dir).contains(1L),
      "compaction must not erase the streaming txn")
    assert(Manifest.readTable(spark, dir).count() == 40)
    assert(Layout.appendInPlace(spark, dir, replay, Seq("doc_id"),
      txn = Some(1L)) == 0, "replay after compaction must still no-op")

    // and a genuinely new batch still lands
    val b3 = (40L until 45L).map(i => SinkDoc(i, s"s${i % 3}", s"b3 $i")).toDF()
    assert(Layout.appendInPlace(spark, dir, b3, Seq("doc_id"),
      txn = Some(2L)) > 0)
    assert(Manifest.readTable(spark, dir).count() == 45)

    // incremental consumption: the change set between snapshots is
    // exactly the appended rows — a downstream pipeline reads O(delta)
    val v = Manifest.currentVersion(spark, dir).get
    val delta = Manifest.readChanges(spark, dir, v - 1, v)
    assert(delta.count() == 5)
    assert(delta.agg(min("doc_id")).head().getLong(0) == 40L)
    // and a same-version window is empty
    assert(Manifest.readChanges(spark, dir, v, v).count() == 0)

    // a batch BEHIND the watermark is not a crash replay (foreachBatch
    // only ever re-delivers the LAST id) — it is a different stream
    // with a fresh checkpoint writing without an appId, and must fail
    // loudly instead of silently dropping its data
    val stale = Seq(SinkDoc(99L, "s0", "stale")).toDF()
    intercept[IllegalStateException] {
      Layout.appendInPlace(spark, dir, stale, Seq("doc_id"),
        txn = Some(0L))
    }
    assert(Manifest.readTable(spark, dir).count() == 45)
  }
}

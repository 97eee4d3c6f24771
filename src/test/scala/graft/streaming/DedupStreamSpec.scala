package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental streaming dedup: batch 1 ingests originals (every
  * band claims its bucket), batch 2 streams near-copies — each must
  * hit its original's buckets and be routed to that owner, without
  * any rescan of batch 1. Bucket state lives in RocksDB, exactly as
  * it would on a cluster.
  */
class DedupStreamSpec extends SparkSpec {

  final case class Doc(doc_id: Long, text: String)

  test("second-batch near-copies are flagged against first-batch owners") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // distinct originals: md5-token texts, so no accidental overlap
      def text(id: Long, drop: Int): String =
        (drop until 40).map(i => s"w${id}x$i").mkString(" ")
      val originals = (0L until 50L).map(id => Doc(id, text(id, 0)))
      // near-copies: drop-first-token variants (shingle overlap ~0.95)
      val copies = (0L until 50L).map(id => Doc(id + 1000, text(id, 1)))

      val stream = MemoryStream[Doc]
      val query = DedupStream.incrementalDedup(spark, stream.toDF())
        .writeStream.format("memory").queryName("inc_dedup")
        .outputMode("update").start()
      try {
        stream.addData(originals); query.processAllAvailable()
        stream.addData(copies); query.processAllAvailable()
      } finally query.stop()

      val out = spark.table("inc_dedup")
      // batch 1: every original owns all its buckets
      val firstBatch = out.filter(col("doc_id") < 1000)
      assert(firstBatch.filter(!col("is_first")).count() == 0)
      // batch 2: every near-copy hits at least one bucket owned by its
      // original (same id - 1000) and is never marked first there
      val hits = out.filter(col("doc_id") >= 1000 && !col("is_first"))
        .select(col("doc_id"), col("owner_id"))
        .distinct().collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      (0L until 50L).foreach { id =>
        val flagged = hits.getOrElse(id + 1000, Set.empty)
        assert(flagged.contains(id),
          s"copy ${id + 1000} not routed to owner $id (hit: $flagged)")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bucket state survives a query restart from its checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def text(id: Long, drop: Int): String =
        (drop until 40).map(i => s"r${id}x$i").mkString(" ")
      val originals = (0L until 20L).map(id => Doc(id, text(id, 0)))
      val copies = (0L until 20L).map(id => Doc(id + 1000, text(id, 1)))

      // one durable checkpoint, two query INCARNATIONS — the daily-batch
      // deployment shape: ingest, shut down, come back tomorrow. The
      // sink is foreachBatch (memory-format sinks refuse checkpoint
      // recovery), each incarnation draining into its own buffer.
      val ck = java.nio.file.Files
        .createTempDirectory("graft-dedup-restart-ck").toString
      val stream = MemoryStream[Doc]
      def start(sink: java.util.List[DedupStream.BandDecision]) =
        DedupStream.incrementalDedup(spark, stream.toDF())
          .writeStream
          .option("checkpointLocation", ck)
          .outputMode("update")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[DedupStream.BandDecision],
                _: Long) =>
              sink.addAll(java.util.Arrays.asList(b.collect(): _*))
              ()
          }
          .start()

      val day1Out = java.util.Collections.synchronizedList(
        new java.util.ArrayList[DedupStream.BandDecision]())
      val day1 = start(day1Out)
      try { stream.addData(originals); day1.processAllAvailable() }
      finally day1.stop()

      val day2Out = java.util.Collections.synchronizedList(
        new java.util.ArrayList[DedupStream.BandDecision]())
      val day2 = start(day2Out)
      try { stream.addData(copies); day2.processAllAvailable() }
      finally day2.stop()

      // day 2's sink only saw day 2's batch, yet every near-copy is
      // routed to its DAY-1 owner: the bucket map was recovered from
      // the checkpointed RocksDB state, not recomputed
      import scala.jdk.CollectionConverters._
      val out = day2Out.asScala.toSeq
      assert(!out.exists(_.doc_id < 1000),
        "restarted query must not reprocess day 1")
      val hits = out.filter(d => d.doc_id >= 1000 && !d.is_first)
        .groupBy(_.doc_id).view.mapValues(_.map(_.owner_id).toSet).toMap
      (0L until 20L).foreach { id =>
        val flagged = hits.getOrElse(id + 1000, Set.empty)
        assert(flagged.contains(id),
          s"copy ${id + 1000} lost its pre-restart owner $id (hit: $flagged)")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

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
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Incremental near-dup dedup over a DOCUMENT STREAM — the streaming
  * analogue of [[graft.ops.Pipeline.crossDedup]]: as documents
  * arrive, their MinHash band keys claim buckets in keyed state; a
  * doc whose band key lands in a bucket already owned by an earlier
  * doc is a near-dup candidate of that owner. This is how a crawl
  * pipeline dedups against everything already ingested WITHOUT
  * re-scanning the corpus: state is the bucket→owner map, bounded by
  * O(distinct band keys), in RocksDB at scale.
  *
  * Shapes: the signature/banding projection is the same codegen
  * MinHash path the batch operators use (stateless, so it runs
  * unchanged on a streaming DataFrame); ownership is a
  * `transformWithState` ValueState per band key — exactly one
  * shuffle, on the band key. Per-band decisions stream out; the
  * consumer ORs them per doc (a doc is flagged iff any of its bands
  * hit a foreign bucket).
  */
object DedupStream {

  final case class BandRow(doc_id: Long, band_key: String)
  final case class BandDecision(
      doc_id: Long, band_key: String, owner_id: Long, is_first: Boolean)

  /** (doc_id, band_key) rows via the batch signature path (stateless
    * projections — streaming-safe).
    */
  def bandRows(docs: DataFrame): DataFrame = {
    val corpus = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val sigs = graft.ops.Dedup.signatures(corpus)
    val bandKeys = transform(sequence(lit(0), lit(graft.ops.Dedup.Bands - 1)),
      j => concat_ws("_", lit("b"), j,
        element_at(col("sig"), j * 2 + 1), element_at(col("sig"), j * 2 + 2)))
    sigs.select(col("doc_id"), explode(bandKeys).as("band_key"))
  }

  final case class Owner(id: Long)

  /** Keyed bucket ownership: the first doc to present a band key owns
    * its bucket; later docs presenting the same key are routed to the
    * owner. State per key is a single long — O(distinct band keys)
    * total, the minimum any incremental dedup must hold.
    */
  class BucketOwnerProcessor
      extends StatefulProcessor[String, BandRow, BandDecision] {
    @transient private var owner: ValueState[Owner] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Owner]("owner",
        Encoders.product[Owner], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[BandDecision] =
      rows.map { r =>
        Option(owner.get()) match {
          case None =>
            owner.update(Owner(r.doc_id))
            BandDecision(r.doc_id, key, r.doc_id, is_first = true)
          case Some(Owner(first)) =>
            BandDecision(r.doc_id, key, first, is_first = r.doc_id == first)
        }
      }
  }

  /** Wire the stream: docs -> band rows -> keyed ownership decisions.
    * Update output mode: every band presentation emits its decision.
    */
  def incrementalDedup(spark: SparkSession,
      docs: DataFrame): Dataset[BandDecision] = {
    import spark.implicits._
    bandRows(docs).as[BandRow]
      .groupByKey(_.band_key)
      .transformWithState(new BucketOwnerProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.ops.Sketch

/** Streaming cardinality maintenance: distinct users per event type
  * tracked as HLL registers in keyed state, updated incrementally as
  * events arrive — the streaming twin of [[graft.ops.Sketch]]'s
  * batch/merge form, closing the sketch family's third leg
  * (batch, incremental batch, streaming).
  *
  * State is one small int per (event_type, register) key — at most
  * types x 256 entries TOTAL, independent of event volume: the
  * register max is the entire memory a cardinality estimate needs,
  * which is why a 100 TB event stream's distinct-user dashboards run
  * on sketches and not on `COUNT(DISTINCT)` state. The register
  * projection is the same stateless Column arithmetic as the batch
  * path ([[Sketch.hllReg]]/[[Sketch.hllRank]]), so the drained
  * stream's estimate equals the batch estimate BIT-FOR-BIT — the
  * `st_hll_users` oracle recomputes it in DuckDB directly over the
  * events table.
  */
object HllStream {

  final case class RegRow(event_type: String, reg: Long, rank: Int)
  final case class RegMax(event_type: String, reg: Long, m: Int)

  /** Stateless projection: one (event_type, reg, rank) row per event.
    * Runs unchanged on batch or streaming frames.
    */
  def regRows(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      Sketch.hllReg(col("user_id")).as("reg"),
      Sketch.hllRank(col("user_id")).cast("int").as("rank"))

  /** Keyed register max: state is ONE int per (event_type, reg);
    * each batch emits the key's current max so the sink always holds
    * the latest register table.
    */
  class RegMaxProcessor
      extends StatefulProcessor[(String, Long), RegRow, RegMax] {
    @transient private var state: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Int]("m", Encoders.scalaInt,
        TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[RegRow],
        timerValues: TimerValues): Iterator[RegMax] = {
      val prev = Option(state.get()).getOrElse(0)
      val next = rows.foldLeft(prev)((b, r) => math.max(b, r.rank))
      state.update(next)
      Iterator.single(RegMax(key._1, key._2, next))
    }
  }

  /** Drain the events files as a stream with `Trigger.AvailableNow`,
    * maintaining HLL registers in `transformWithState`; estimate
    * cardinalities from the final register table and report them next
    * to the BATCH exact distinct count — streamed sketch vs batch
    * truth in one row.
    */
  def availableNowHllUsers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // glob-address the single parquet file (see availableNowHourly);
    // normalize ts to plain TIMESTAMP so any future watermark on this
    // path analyzes under every testdata encoding
    val stream = graft.ops.T.normalizeEventTime(
      spark.readStream.schema(raw.schema).parquet(s"$sfDir/events.parque[t]"),
      ntz = false)
    val regs = regRows(stream).as[RegRow]
      .groupByKey(r => (r.event_type, r.reg))
      .transformWithState(new RegMaxProcessor,
        TimeMode.None(), OutputMode.Update())
    val sink = "st_hll_users_sink"
    // transformWithState requires the RocksDB state store provider;
    // set it for the drain and restore the session's prior value
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
      val query = regs.writeStream
        .format("memory").queryName(sink)
        .outputMode(OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    // update-mode sinks append per-batch emissions; max-reduce to the
    // final register table (register ranks only ever grow)
    val finalRegs = spark.table(sink)
      .groupBy("event_type", "reg").agg(max("m").as("m"))
    val est = Sketch.hllEstimate(finalRegs, "event_type")
    val exact = raw.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_users"),
        col("hll_estimate").as("hll_users"))
      .orderBy("event_type")
  }

  def hllUsersOracle: String = {
    val h = graft.ops.H.duckHash60("user_id::VARCHAR")
    s"""WITH ranked AS (
       |  SELECT event_type, $h % ${Sketch.HllM} AS reg,
       |    $h // ${Sketch.HllM} AS w
       |  FROM events),
       |regs AS (
       |  SELECT event_type, reg,
       |    max(CASE WHEN w = 0 THEN ${Sketch.HllW + 1}
       |        ELSE ${Sketch.HllW + 1} - length(bin(w)) END) AS m
       |  FROM ranked GROUP BY event_type, reg),
       |${Sketch.hllEstimateSqlCtes("event_type", "regs")},
       |exact AS (
       |  SELECT event_type, count(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY event_type)
       |SELECT event_type, exact_users, hll_estimate AS hll_users
       |FROM exact JOIN est USING (event_type)
       |ORDER BY event_type""".stripMargin
  }
}

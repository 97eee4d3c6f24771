package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming pipelines over the `events` stream — the
  * streaming forms of graft.ops.Events (same aggregation shapes, same
  * column names), plus watermarked dedup and custom keyed state.
  *
  * Scale posture: these are the standard scalable shapes — watermarked
  * windowed aggs keep state bounded by (watermark horizon x key
  * cardinality); session windows and mapGroupsWithState shuffle once
  * on the grouping key and keep per-key state in the state store
  * (RocksDB at scale); dropDuplicatesWithinWatermark bounds the dedup
  * state the same way.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Tumbling 1-hour counts with a 2-hour watermark (append mode). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("mass"))
      .select(col("window").getField("start").as("window_start"),
        col("event_type"), col("n"), col("mass"))

  /** Session windows (30-minute gap) per user, watermarked. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window").getField("start").as("session_start"),
        col("n_events"))

  /** Exactly-once-style dedup on event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks in the preceding hour. Watermarks on BOTH sides plus
    * the time-bound join condition let Spark evict join state older
    * than (watermark - 1 hour) — without them the join state grows
    * unboundedly. Inner-join results emit as soon as both sides arrive.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id"), col("c_ts"))
  }

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-user event count + value total
    * via mapGroupsWithState (the escape hatch for state machines the
    * built-in windows can't express).
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, total) = batch.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }

  /** The same running totals on Spark 4's `transformWithState` API —
    * typed `ValueState` handles, per-state TTL, timers. This is the
    * forward-looking state surface (RocksDB-backed only); semantics
    * match [[runningUserTotals]], proven by the spec.
    */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var state: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning]("totals",
        Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
      val next = rows.foldLeft(prev) { (b, e) =>
        UserRunning(key, b.n + 1, b.total + e.value)
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** End-to-end `Trigger.AvailableNow` run of [[hourlyTypeCounts]]
    * over the events parquet READ AS A STREAM, drained to completion
    * into a memory sink, returning the final table. This is the
    * batch-stream equivalence contract: the result must equal the
    * batch aggregation over the same files (the `st_available_now`
    * oracle entry shares `st_hourly_window`'s SQL).
    *
    * Complete output mode, deliberately: with append mode the windows
    * inside the final watermark horizon would never emit for a
    * bounded input. The sink holds only the aggregated table
    * (hours x event_types), not the event stream, so "memory" is
    * safe at any corpus size.
    */
  def availableNowHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet") // schema probe
    // the table is a single parquet FILE: a plain file path makes the
    // file stream source force basePath to the file (then reject it as
    // "must be a directory"), so address it with a glob — glob paths
    // keep basePath inference on the parent directory
    val stream = spark.readStream.schema(raw.schema)
      .parquet(s"$sfDir/events.parque[t]")
    // shared ts normalization (nanos-long / TIMESTAMP / TIMESTAMP_NTZ),
    // to plain TIMESTAMP: watermarks require it, and with the session
    // TZ pinned to UTC the wall-clock values are identical
    val events = graft.ops.T.normalizeEventTime(stream, ntz = false)
    val sink = "st_available_now_sink"
    val query = hourlyTypeCounts(events).writeStream
      .format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(sink)
  }
}

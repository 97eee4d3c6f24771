package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-window operators over the `events` table — the batch forms of
  * the Structured Streaming pipelines in `graft.streaming` (SURVEY.md
  * §2.B streaming row). Batch-first so they are oracle-checkable; the
  * streaming package reuses the same aggregation shapes behind
  * `readStream` + watermark.
  *
  * Scale notes: tumbling windows groupBy (window, type) — map-side
  * combinable, shuffle is O(#windows x #types). Sessionization uses
  * Spark's native `session_window` (state-store-backed in streaming,
  * merge-sort in batch), shuffling on user_id only.
  */
object Events {

  /** Tumbling 1-hour windows: count + mass per (hour, event_type). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("mass"))
      .orderBy("window_start", "event_type")

  /** Sliding windows: 1-hour window sliding by 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour", "30 minutes").getField("start")
          .as("window_start"))
      .agg(count(lit(1)).as("n"))
      .orderBy("window_start")

  /** Signup -> purchase funnel per user: first signup, first purchase
    * AFTER that signup, and whether the user converted. One shuffle on
    * user_id; conditional aggregation instead of self-joins.
    */
  def signupPurchaseFunnel(events: DataFrame): DataFrame = {
    val firstSignup = events
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    firstSignup
      .join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "signup_ts")
      .agg(min(when(col("p_ts") >= col("signup_ts"), col("p_ts")))
        .as("first_purchase_ts"))
      .select(col("user_id"),
        date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("signup_ts"),
        date_format(col("first_purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("first_purchase_ts"),
        col("first_purchase_ts").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  /** Watermark semantics in batch form: keep only events within the
    * last `lateness` of the stream's max timestamp (what a streaming
    * watermark would admit at end-of-stream), counted per type.
    *
    * The max-ts scalar is a separate tiny aggregate broadcast into the
    * filter — NOT a global window (which would single-partition the
    * whole table).
    */
  def watermarkAdmitted(events: DataFrame, lateness: String = "6 hours"): DataFrame = {
    val mx = events.agg(max("ts").as("mx"))
    events.join(broadcast(mx),
        col("ts") >= col("mx") - expr(s"INTERVAL $lateness"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Session windows with a 30-minute inactivity gap, per user:
    * session start + event count. Native `session_window` keeps the
    * whole computation in one shuffle on user_id.
    */
  def userSessions(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window").getField("start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
}

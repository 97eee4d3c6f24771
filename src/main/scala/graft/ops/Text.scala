package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text operators — the reference's actual analytics
  * (/root/reference/frame_tasks/basic_tasks.py) re-expressed as
  * declarative Spark plans.
  *
  * Scale notes (100 TB posture):
  *  - token counting is a map-side-combinable groupBy: partial
  *    aggregation happens before the shuffle, so shuffle volume is
  *    O(vocabulary), not O(corpus tokens).
  *  - the top-p running sum operates on the *aggregated* vocabulary
  *    table, never the raw token stream, and is a two-stage
  *    range-partitioned prefix sum — no single executor ever sorts
  *    the whole vocabulary (see [[Text.topPTokens]]).
  *  - total mass and per-partition offsets ride one broadcast of an
  *    O(#partitions)-row table, not an unpartitioned window.
  */
object Text {

  /** F2+F3+P3 composed: token stream (doc_id kept as the stable row id;
    * the reference's `sample_ind` is a pre-explode row index,
    * basic_tasks.py:62-65).
    */
  def tokenize(docs: DataFrame): DataFrame =
    Tok.tokens(docs.select("doc_id", "text"), "text")
      .select("doc_id", "token")

  /** G1: value_counts — group by value, count, count-descending with a
    * deterministic tiebreaker (SURVEY §2.B O1).
    */
  def valueCounts(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(valueCol).asc)

  /** W1+W2: the flagship top-p mass cut ("top90",
    * basic_tasks.py:92-105). Keeps tokens whose running
    * count-descending mass stays under `p` x total mass.
    *
    * The global running sum is a TWO-STAGE prefix sum, never a
    * single-partition sort of the vocabulary (at 100 TB a token
    * vocabulary reaches 1e8-1e9 rows — one executor must not sort
    * and scan all of it):
    *  1. range-partition the counts by the global sort key; each
    *     partition computes its LOCAL running sum in parallel (the
    *     pid-window exchange holds one range-slice per group);
    *  2. per-partition totals (one row per partition, O(#partitions)
    *     regardless of data size) get their cumulative offsets and
    *     the grand total in one trivially-small window, and are
    *     broadcast-joined back: running = offset + local running.
    * Range boundaries come from sampling, but the result is exact for
    * ANY boundary placement — offsets are computed from the actual
    * partition sums in range (= global) order, and the (cnt, token)
    * key is unique so no group straddles a boundary ambiguously.
    * The pid-stamped slice is PERSISTED before fanning out to its two
    * consumers: spark_partition_id is physical, and without a pinned
    * materialization the branches would re-sample range boundaries
    * independently whenever exchange reuse doesn't fire (conf off,
    * plan drift) and silently disagree on pids. The cache holds the
    * vocab-sized table only — O(|vocab|), corpus never cached, corpus
    * scanned once — and is dropped by the ContextCleaner when the
    * result frame is released. PlanShapeSpec pins that no
    * single-partition exchange carries token-level rows.
    */
  def topPTokens(docs: DataFrame, p: Double = 0.9): DataFrame = {
    val counts = tokenize(docs).groupBy("token").agg(count(lit(1)).as("cnt"))
    topPMassCut(counts, col("token"), col("cnt"), p)
      .select(col("__key").as("token"), col("__cnt").as("cnt"))
  }

  /** The two-stage top-p mass cut over an arbitrary (key, count)
    * frame — the reusable core of [[topPTokens]], also registered as
    * the planner's `top90` task so every consumer of the running-sum
    * cut gets the scale-safe plan. Returns canonical columns
    * (`__key`, `__cnt`), count-descending with the key as tiebreaker;
    * callers rename to their schema.
    */
  def topPMassCut(countsIn: DataFrame, key: org.apache.spark.sql.Column,
      cnt: org.apache.spark.sql.Column, p: Double): DataFrame = {
    val counts = countsIn.select(key.as("__key"), cnt.as("__cnt"))
    val parted = counts
      .repartitionByRange(col("__cnt").desc, col("__key").asc)
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = Window.partitionBy("pid")
      .orderBy(col("__cnt").desc, col("__key").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = parted.withColumn("local_run", sum("__cnt").over(local))
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = parted.groupBy("pid").agg(sum("__cnt").as("part_sum"))
      .select(col("pid"),
        coalesce(sum("part_sum").over(prior), lit(0L)).as("offset"),
        sum("part_sum").over(whole).as("total"))
    withLocal
      .join(broadcast(offsets), Seq("pid"))
      .filter(col("offset") + col("local_run") < lit(p) * col("total"))
      .select("__key", "__cnt")
      .orderBy(col("__cnt").desc, col("__key").asc)
  }

  /** W2 detail form: the token *stream* filtered to top-p tokens —
    * exactly the reference's output frame (istop flag broadcast-joined
    * onto the detail rows, basic_tasks.py:101-103 = J2 + P4).
    */
  def topPDetail(docs: DataFrame, p: Double = 0.9): DataFrame = {
    val flags = topPTokens(docs, p).select(col("token"), lit(true).as("istop"))
    tokenize(docs)
      .join(broadcast(flags), Seq("token"), "left")
      .filter(coalesce(col("istop"), lit(false)))
      .select("doc_id", "token")
      .orderBy(col("doc_id").asc, col("token").asc)
  }
}

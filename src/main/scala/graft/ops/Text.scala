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
  *  - the top-p window runs over the *aggregated* vocabulary table
  *    (small), never over the raw token stream, so the single-partition
  *    global window is bounded by |vocab| regardless of corpus size.
  *  - the total mass is joined back via a broadcast of a 1-row
  *    aggregate, not a second unpartitioned window.
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
    */
  def topPTokens(docs: DataFrame, p: Double = 0.9): DataFrame = {
    val counts = tokenize(docs).groupBy("token").agg(count(lit(1)).as("cnt"))
    // both windows run over the same single-partition exchange of the
    // vocab-sized counts table: one corpus scan total. (The
    // alternative — a broadcast 1-row total — recomputes counts from
    // the corpus, i.e. scans the corpus twice.)
    val running = Window
      .orderBy(col("cnt").desc, col("token").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("running", sum(col("cnt")).over(running))
      .withColumn("total", sum(col("cnt")).over(whole))
      .filter(col("running") < lit(p) * col("total"))
      .select("token", "cnt")
      .orderBy(col("cnt").desc, col("token").asc)
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

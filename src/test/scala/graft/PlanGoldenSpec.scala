package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan-stability fingerprints for the headline queries: the FINAL
  * (post-AQE) physical plan of each is reduced to a signature of its
  * load-bearing operators — joins, exchanges, aggregates, windows,
  * generates — and pinned against a golden value. A Spark-version
  * bump, rule change, or refactor that flips a BroadcastHashJoin to a
  * SortMergeJoin (or sneaks in an extra Exchange) becomes a test diff
  * here, not a bench surprise next round.
  *
  * The signature deliberately excludes Project/Filter/Scan churn and
  * all expression ids, so benign refactors don't trip it; on a
  * mismatch the assertion prints the new signature for a one-line
  * golden update after the plan change is REVIEWED as intended.
  */
class PlanGoldenSpec extends SparkSpec {

  /** Operator kinds that decide the plan's scale behavior. */
  private def loadBearing(name: String): Boolean =
    Seq("Join", "Exchange", "Aggregate", "Window", "Generate",
      "Expand", "TakeOrdered", "CartesianProduct", "TopKPerKey")
      .exists(name.contains)

  private def signature(df: DataFrame): String = {
    df.count() // drive AQE to its final plan
    val counts = scala.collection.mutable.Map.empty[String, Int]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case r: ReusedExchangeExec =>
        counts("ReusedExchange") = counts.getOrElse("ReusedExchange", 0) + 1
      case w: WholeStageCodegenExec => walk(w.child)
      case i: InputAdapter => walk(i.child)
      case _ =>
        val n = p.nodeName.split(" ").head
        if (loadBearing(n)) counts(n) = counts.getOrElse(n, 0) + 1
        p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    counts.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
  }

  /** Golden signatures at sf0.001, local[4], AQE on. Regenerate by
    * reading the assertion message after an INTENDED plan change.
    */
  private val golden = Map(
    // round-10 two-stage prefix sum: the token agg + range exchange
    // live inside the persisted vocab slice (not walked here; pinned
    // by PlanShapeSpec); above it sit the pid-local window, the two
    // O(#partitions) offset windows, the offsets broadcast join, and
    // the presentation sort — no vocab-sized single-partition window
    "w2_top90" -> ("BroadcastExchange:1,BroadcastHashJoin:1,Exchange:4," +
      "HashAggregate:2,Window:3"),
    "q5_region_volume" ->
      "BroadcastExchange:4,BroadcastHashJoin:4,Exchange:2,HashAggregate:2",
    "q3_shipping_priority" ->
      ("BroadcastExchange:2,BroadcastHashJoin:2,Exchange:1,HashAggregate:2," +
        "TakeOrderedAndProject:1"),
    "q21_waiting_suppliers" ->
      ("BroadcastExchange:2,BroadcastHashJoin:2,Exchange:3,HashAggregate:4," +
        "TakeOrderedAndProject:1,Window:1"),
    "j2_left_join" -> "BroadcastExchange:1,BroadcastHashJoin:1,Exchange:1",
    "o3_topk_per_group" -> "Exchange:2,Window:1,WindowGroupLimit:2",
    // custom operator: partial + final TopKPerKeyExec, ONE exchange
    // between them (vs the window form's full-input exchange above)
    "o3_topk_exec" -> "Exchange:2,TopKPerKey:2",
    // persisted IVF-PQ serving path: every join broadcast (centroid /
    // LUT / probe sides are all tiny), zero SortMergeJoin — a flip to
    // a shuffled join here means a broadcast threshold regressed
    "ns_knn_ivfpq_indexed" ->
      ("BroadcastExchange:6,BroadcastHashJoin:4,BroadcastNestedLoopJoin:2," +
        "Exchange:4,Generate:1,HashAggregate:2,Window:3,WindowGroupLimit:5"),
    "ns_knn_pq_rerank" ->
      ("BroadcastExchange:4,BroadcastHashJoin:3,BroadcastNestedLoopJoin:1," +
        "Exchange:3,Generate:1,HashAggregate:2,Window:2,WindowGroupLimit:3"),
    "ns_seq_pack" -> "Exchange:2,Window:1",
    "ns_dedup_exact" -> "Exchange:2,HashAggregate:2",
    // round-13 re-pin (intended): the band self-join moved from
    // sort-merge to shuffled-hash — same exchanges (ReusedExchange
    // still derives signatures once, PlanShapeSpec pins it), minus
    // the two sorts of fat (sig, band, key) rows
    "ns_dedup_minhash_lsh" ->
      "Exchange:4,Generate:2,HashAggregate:2,ShuffledHashJoin:1",
    "ev_funnel" ->
      "BroadcastExchange:1,BroadcastHashJoin:1,Exchange:2,HashAggregate:4",
    // CMS heavy hitters (round-13 re-pin, intended): the token STREAM
    // is aggregated once (first Exchange); the grid build + probe
    // collapsed into one vocab-sized window over (r, bucket) — the
    // old grid-vs-probe BroadcastHashJoin and the second stream-wide
    // Generate are gone, so every Exchange past the first is
    // vocabulary-sized
    "ns_heavy_hitters" ->
      "Exchange:3,Generate:2,HashAggregate:4,TakeOrderedAndProject:1,Window:1",
    // mergeable partials: two grouped halves + the merge, no joins
    "ns_incr_agg" -> "Exchange:3,HashAggregate:6",
    // one SMJ on (source, doc_id) over fixed-width hash rows — the
    // only shuffle join this family needs
    "ns_snapshot_diff" -> "Exchange:4,HashAggregate:2,SortMergeJoin:1",
    // centroid broadcast + ONE conditional aggregation — no self-join
    "ns_label_noise" ->
      ("BroadcastExchange:1,BroadcastNestedLoopJoin:1,Exchange:5," +
        "Generate:1,HashAggregate:6,ObjectHashAggregate:2"),
    // register builds per half + merge + estimate + exact side
    "ns_hll_distinct" ->
      ("BroadcastExchange:1,BroadcastHashJoin:1,Exchange:6,Generate:3," +
        "HashAggregate:12"))

  for ((name, expected) <- golden.toSeq.sortBy(_._1)) {
    test(s"plan fingerprint: $name") {
      val actual = signature(SparkEntry.queries(name)(spark, sf))
      assert(actual == expected,
        s"""plan shape of $name changed:
           |  golden: $expected
           |  actual: $actual
           |If the change is intended, update the golden entry.""".stripMargin)
    }
  }
}

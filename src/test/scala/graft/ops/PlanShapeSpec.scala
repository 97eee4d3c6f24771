package graft.ops

import graft.SparkSpec

/** Physical-plan shape guards — the properties that make these
  * operators scale, asserted so a refactor can't silently lose them.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("flagship scans only the text column (column pruning)") {
    val p = plan("w2_top90")
    assert(p.contains("ReadSchema: struct<text:string>"), p.take(2000))
  }

  test("prefix filter is pushed to the parquet scan") {
    val p = plan("p2_prefix_filter")
    assert(p.contains("PushedFilters") && p.contains("StringStartsWith"),
      p.take(2000))
  }

  test("token aggregation is partial before the shuffle (map-side combine)") {
    val p = plan("w2_top90")
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("dimension lookup joins broadcast, not shuffle") {
    val p = plan("j2_left_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("kNN keeps the query side broadcast (corpus never shuffles)") {
    val p = plan("ns_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("pairwise cosine uses the custom DotProduct expression") {
    val p = plan("ns_embed_neardup")
    // the custom expression replaced the interpreted higher-order
    // formulation (which would render as aggregate(zip_with(...)))
    assert(p.contains("dotproduct("), p.take(2000))
    assert(!p.contains("zip_with"), p.take(2000))
  }
}

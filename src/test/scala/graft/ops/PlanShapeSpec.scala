package graft.ops

import graft.SparkSpec

/** Physical-plan shape guards — the properties that make these
  * operators scale, asserted so a refactor can't silently lose them.
  */
class PlanShapeSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

  /** Every node of the physical plan, descending through AQE wrappers,
    * finalized query stages, and cached (InMemoryRelation) subplans —
    * a persist() must not hide the scan shape from these pins.
    */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case other => other.children
    }
    p +: kids.flatMap(walk)
  }

  private def plan(name: String): String = {
    val root = graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan
    walk(root).collect { case s: InMemoryTableScanExec =>
      s.relation.cachedPlan.toString
    }.mkString(root.toString, "\n--- cached subplan ---\n", "")
  }

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

  test("multi-table LSH reads the corpus ONCE: one scan, one broadcast join") {
    // 4 hash tables must not mean 4 corpus scans (parquet decode of
    // the vectors is the dominant linear cost): all buckets derive
    // from a single pass, candidates come from ONE broadcast-hash
    // join on the composite (table, bucket) key, and the corpus never
    // shuffles before the bounded candidate stream's dedup/rank
    val p = plan("ns_knn_lsh_tables")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <= 2 parquet scans (corpus + ladder count), saw $scans:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("pairwise cosine uses the custom DotProduct expression") {
    val p = plan("ns_embed_neardup")
    // the custom expression replaced the interpreted higher-order
    // formulation (which would render as aggregate(zip_with(...)))
    assert(p.contains("dotproduct("), p.take(2000))
    assert(!p.contains("zip_with"), p.take(2000))
  }

  test("range join broadcasts the band side (fact side never shuffles for the join)") {
    val p = plan("j4_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("lateral top-2 decorrelates to a ranked window, not a per-row re-scan") {
    val p = plan("sql_lateral")
    assert(p.contains("row_number") || p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("IVF corpus assignment is map-only: nearest_cell, no n x C stream") {
    // the corpus side assigns cells via the codegen'd NearestCell
    // argmax (zero shuffle, no crossJoin-materialized score stream);
    // only the tiny query side may score against all centroids
    val p = plan("ns_knn_ivf")
    assert(p.contains("nearestcell") || p.toLowerCase.contains("nearestcell"),
      p.take(3000))
    // the old shape's give-away: a struct-max partial agg over vec_id
    // reassembling the scored stream
    assert(!p.contains("partial_max(struct(ccos"), p.take(3000))
  }

  test("typed aggregator keeps partial aggregation (map-side combine)") {
    val p = plan("ds_typed_agg")
    assert(p.contains("partial_"), p.take(3000))
  }

  test("LSH self-join reuses the signature exchange at runtime (AQE)") {
    // the pre-execution plan prints two signature subtrees; the final
    // adaptive plan must collapse side b into a ReusedExchange so
    // md5-shingling + minhash transforms run once
    val df = graft.SparkEntry.queries("ns_dedup_minhash_lsh")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("sequence packing is one partitioned window, zero joins") {
    val p = plan("ns_seq_pack")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    // the window partitions by source — never a global (empty
    // partition-spec) window over the corpus. In executedPlan.toString
    // a Window prints "Window [exprs], [partitionSpec], [orderSpec]".
    assert(p.contains("], [source#"), p.take(2000))
  }

  test("wide-simhash block join reuses the bit-vote exchange at runtime (AQE)") {
    val df = graft.SparkEntry.queries("ns_dedup_simhash64")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("unpivot stays map-only until the final presentation sort") {
    val p = plan("g3_unpivot")
    assert(!p.contains("HashAggregate"), p.take(3000))
  }

  test("PMI id assignment is distributed (no global-order window over the vocab)") {
    // round-13 verdict #2: a bare Window.orderBy("t") sorts the whole
    // qualifying vocabulary on ONE core. The distributed form ranks
    // within range partitions (partition spec [pid]) and only runs a
    // global window over the numPartitions-row offset table. A Window
    // prints "[exprs], [partitionSpec], [orderSpec]" — so an empty
    // partition spec ordered by the token column is the banned shape.
    val p = plan("ns_pmi_pairs")
    assert(!p.contains("], [], [t#"), p.take(4000))
    assert(p.contains("], [pid#"), p.take(4000))
  }

  test("vocab-sized TF-IDF/PMI sides are not force-broadcast (AQE decides)") {
    // with the broadcast threshold disabled, an unhinted vocab join
    // must fall back to a shuffle join — a forced broadcast() hint
    // would pin BroadcastHashJoin regardless and OOM the driver on a
    // 100 TB corpus's vocabulary
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val p1 = plan("ns_tfidf")
      assert(!p1.contains("BroadcastHashJoin"), p1.take(3000))
      assert(p1.contains("SortMergeJoin"), p1.take(3000))
      val p2 = plan("ns_pmi_pairs")
      assert(!p2.contains("BroadcastHashJoin"), p2.take(3000))
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("TPC-H dims broadcast at fixture scale WITHOUT forced hints (AQE size gate)") {
    // round-10 verdict #1: customer/supplier/part scale linearly, so
    // their joins are unhinted — this pin proves the size-gated plan
    // still broadcasts them at fixture SF (no silent SMJ regression)…
    for (name <- Seq("q3_shipping_priority", "q8_market_share",
        "q9_nation_profit", "q10_returned_revenue", "q18_large_orders",
        "j2_left_join")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name:\n" + p.take(2000))
      assert(!p.contains("SortMergeJoin"), s"$name:\n" + p.take(2000))
    }
  }

  test("TPC-H scaling tables are NOT force-broadcast (hint removed, threshold decides)") {
    // …and this one proves the broadcast really is the threshold's
    // choice: with the gate closed, the customer/supplier/part joins
    // must fall back to shuffle joins. A forced broadcast() hint would
    // keep them BroadcastHashJoin regardless — the 100 TB driver-OOM
    // plan this guards against. (q8/q9 keep their bounded
    // nation/region hints, which legitimately broadcast even here.)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      for (name <- Seq("q3_shipping_priority", "q18_large_orders",
          "j2_left_join")) {
        val p = plan(name)
        assert(!p.contains("BroadcastHashJoin"), s"$name:\n" + p.take(3000))
      }
      // these keep a bounded nation/region hint (still a BHJ even with
      // the gate closed) — the scaling-table joins must show as SMJ
      for (name <- Seq("q5_region_volume", "q8_market_share",
          "q9_nation_profit", "q10_returned_revenue",
          "q21_waiting_suppliers")) {
        val p = plan(name)
        assert(p.contains("SortMergeJoin"), s"$name:\n" + p.take(3000))
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("manifest reads keep parquet pushdown under the recorded schema; DV join broadcasts") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ps-mf").toString
    docs.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))
    Layout.deleteMergeOnRead(spark, dir, col("doc_id") === 5L,
      Seq("doc_id"))

    val p = Manifest.readTable(spark, dir)
      .filter(col("doc_id").between(10, 20))
      .queryExecution.executedPlan.toString
    // the recorded-schema read must NOT cost the scan its pushed
    // filters — a user-specified schema done wrong would
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(doc_id,10)"), p.take(3000))
    // and the deletion-vector subtraction stays a broadcast anti-join
    // (a shuffle here would tax every read of the table)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("top-p prefix sum never funnels the vocabulary through one partition") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // materialize so AQE finalizes its stages — the pin must hold on
    // the plan that actually ran, not the pre-adaptive sketch
    val df = graft.SparkEntry.queries("w2_top90")(spark, sf)
    df.collect()
    val singles = walk(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition => e
    }
    // the only legal single-partition funnel is the O(#partitions)
    // offsets table (pid/part_sum) — token-level rows must never
    // converge on one executor (the 1e9-row-vocab failure mode)
    val offending = singles.filter(_.output.exists(_.name == "token"))
    assert(offending.isEmpty,
      s"vocabulary rows cross a SinglePartition exchange:\n" +
        offending.map(_.toString).mkString("\n"))
    assert(singles.forall(_.output.length <= 3),
      "single-partition exchanges must carry only the tiny offsets frame")
  }

  test("bm25 query scoring cuts on TopKPerKey partial heaps, not a corpus window") {
    val p = plan("ns_bm25_query")
    // two-stage custom operator present (partial + final; SparkPlan
    // tree strings strip the Exec suffix)
    assert("TopKPerKey".r.findAllIn(p).size >= 2, p.take(3000))
    // ...and the only Window nodes run on ALREADY-CUT rows: the
    // nQueries*qTerms query-map ranking and the <= nQueries x k rn —
    // never the scored stream (which would funnel corpus-sized
    // groups through nQueries tasks)
    assert("Window".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("every registered query plans cleanly with zero CartesianProducts") {
    // blanket guard: all pair generation must stay broadcast or
    // bucketed — an unconstrained cross product anywhere is the 100 TB
    // failure mode. Also proves every registry entry analyzes.
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}

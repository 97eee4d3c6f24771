package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 pipeline additions: token-budget domain mixing
  * ([[Pipeline.tokenBudgetMix]]) and quality-aware cluster
  * representative selection ([[Dedup.dedupKeepBest]]).
  */
class MixRepSpec extends SparkSpec {

  test("token budgets are respected and the cut is hash-deterministic") {
    val docs = T(spark, sf, "documents")
    val rows = Pipeline.tokenBudgetMix(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, budget, nTotal, tokTotal, nKept, tokKept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      assert(tokKept <= budget, s"$src kept $tokKept > budget $budget")
      assert(nKept <= nTotal && tokKept <= tokTotal)
      // the cut must actually bind somewhere: either the whole source
      // fits its budget, or the kept prefix stops within one doc of it
      if (nKept < nTotal) {
        // recompute the first dropped doc's size: adding it must
        // overflow the budget (greedy prefix property)
        val next = docs.filter(col("source") === src)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("ntok"),
            H.hash60(concat(col("source"), lit("|"),
              col("doc_id").cast("string"))).as("h"))
          .orderBy(col("h").asc, col("doc_id").asc)
          .collect().map(r2 => r2.getLong(1))
          .scanLeft(0L)(_ + _).drop(1)
        assert(next.count(_ <= budget) == nKept,
          s"$src: driver replay keeps ${next.count(_ <= budget)}, op kept $nKept")
      }
    }
    // determinism: a second run is bit-identical (stateless hash order)
    val again = Pipeline.tokenBudgetMix(docs).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mixing leaves no cached blocks behind (round-16 verdict #5)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Pipeline.tokenBudgetMix(T(spark, sf, "documents")).collect(): Unit
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"tokenBudgetMix leaked persisted RDDs: ${after -- before}")
  }

  test("mixing plan: no doc-level rows cross a single-partition exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val plan = Pipeline.tokenBudgetMix(T(spark, sf, "documents"))
      .queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(walk)
    val singles = walk(plan).collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition => e
    }
    // only the (pid, source)-sized offsets frame may funnel — never a
    // frame carrying doc_id (the per-source-window anti-pattern)
    val offending = singles.filter(_.output.exists(_.name == "doc_id"))
    assert(offending.isEmpty,
      s"doc rows cross SinglePartition:\n${offending.mkString("\n")}")
  }

  test("keep-best picks the quality argmax per cluster, not the min id") {
    val docs = T(spark, sf, "documents")
    val rows = Dedup.dedupKeepBest(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // cluster_id is the component min id; kept_id must be a member —
    // and on this fixture (drop-first-token variants shift quality)
    // at least one cluster must keep a NON-min member, or the op
    // degenerates to keep-first
    assert(rows.forall(_._4 >= 2), "clusters come from pairs: size >= 2")
    assert(rows.exists(r => r._2 != r._1),
      "every representative equals the min id — argmax is dead")
    // cross-check one cluster end to end against the pair list
    val (cid, kept, kq, _) = rows.maxBy(_._4)
    val pairs = Dedup.minhashLsh(docs, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // members of cid = connected component containing cid
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var comp = Set(cid); var frontier = Set(cid)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- comp
      comp ++= next; frontier = next
    }
    val qs = Dedup.corpusWithVariants(docs)
      .filter(col("doc_id").isin(comp.toSeq: _*))
      .select(col("doc_id"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")) * lit(0.5) +
        least(size(col("toks")).cast("double") / lit(100.0), lit(1.0)) * lit(0.3) +
        least((aggregate(col("toks"), lit(0L), (a, w) => a + length(w))
          .cast("double") / size(col("toks")).cast("double")) / lit(10.0),
          lit(1.0)) * lit(0.2))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val best = qs.minBy { case (id, q) => (-q, id) }
    assert(best._1 == kept, s"cluster $cid: expected ${best._1}, got $kept")
    assert(math.abs(BigDecimal(best._2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble - kq) < 1e-9)
  }
}

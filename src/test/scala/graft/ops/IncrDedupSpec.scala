package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Incremental dedup against the persisted LSH band index
  * ([[Dedup.lshIndexBuild]]/[[Dedup.dedupIncr]]): decision parity
  * with the full in-memory pair list, the fixture's guarantee that
  * both duplicate classes occur, and the dynamic partition pruning
  * the bucket layout exists for.
  */
class IncrDedupSpec extends SparkSpec {

  test("batch decisions match the full pair list and prune buckets") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-lshidx-spec").toString
    Dedup.lshIndexBuild(Dedup.incrBase(docs), dir)

    // one directory per probe bucket on disk
    val bucketDirs = new java.io.File(s"$dir/bands").listFiles
      .filter(_.isDirectory).count(_.getName.startsWith("bucket="))
    assert(bucketDirs > 1, s"expected >1 bucket directories, got $bucketDirs")

    val res = Dedup.dedupIncr(docs, dir, 0.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // the % 50 / % 30 = 7 split guarantees both dup classes at any SF
    // (% 50: original+variant both in the batch -> dup_batch;
    // % 30 = 7: original in the batch, variant in the base ->
    // dup_corpus; see Dedup.incrBatchPred)
    val decisions = res.map(_._2).toSet
    assert(decisions == Set("dup_corpus", "dup_batch", "kept"), decisions)

    // recompute expected decisions from the FULL corpus pair list
    // (index + probe must find exactly the pairs one big LSH run finds)
    val batchIds = Dedup.incrBatch(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup
      .minhashPairs(Dedup.corpusWithVariants(docs), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = batchIds.toSeq.sorted.map { d =>
      val corpusMatches = pairs.collect {
        case (a, b) if a == d && !batchIds(b) => b
        case (a, b) if b == d && !batchIds(a) => a
      }
      val batchMatches = pairs.collect {
        case (a, b) if b == d && batchIds(a) => a
      }
      if (corpusMatches.nonEmpty) (d, "dup_corpus", corpusMatches.min)
      else if (batchMatches.nonEmpty) (d, "dup_batch", batchMatches.min)
      else (d, "kept", -1L)
    }
    assert(res.toSeq == expected)

    // the probe scan carries a dynamicpruning partition filter on the
    // bucket column, so unprobed bucket directories are never read
    val plan = Dedup.dedupIncr(docs, dir, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }

  test("broadcast gate is MEASURED: boundary flips the plan, decisions don't change") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-lshidx-gate").toString
    Dedup.lshIndexBuild(Dedup.incrBase(docs), dir)
    val batch = Dedup.incrBatch(docs)
    val bandRows = batch.count() * Dedup.Bands

    // with autoBroadcastJoinThreshold=-1 below, the ONLY possible
    // BroadcastHashJoin is the gate's hinted probe join — its
    // presence/absence is the gate's plan observable. (DPP is NOT the
    // observable: past the gate Spark still runs the pruning filter
    // as an independent subquery when it estimates benefit, which is
    // correct and desirable at backfill scale.)
    def bcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    def dpp(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.toLowerCase
        .contains("dynamicpruning")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val rowsKey = "spark.graft.incrBroadcastRows"
    val forceKey = "spark.graft.incrBroadcastBatch"
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val savedAuto = spark.conf.get(autoKey)
    try {
      // at fixture scale the planner would auto-broadcast the tiny
      // batch side regardless of our hint, masking the gate; disable
      // auto-broadcast so the gate is the only decider — which is
      // the real situation for any batch big enough to be gated
      spark.conf.set(autoKey, "-1")
      // exactly AT the gate (threshold == measured band rows): the
      // broadcast fires and arms dynamic partition pruning
      spark.conf.set(rowsKey, bandRows.toString)
      val at = Dedup.dedupBatchVsIndex(batch, dir, 0.5)
      assert(bcast(at), "at-gate batch should broadcast into the index scan")
      assert(dpp(at), "the broadcast probe should arm DPP")
      val atRows = run(at)

      // one band row PAST the gate: automatic shuffled fallback (the
      // backfill posture — a shuffled index join instead of a driver
      // OOM under a forced broadcast)
      spark.conf.set(rowsKey, (bandRows - 1).toString)
      val past = Dedup.dedupBatchVsIndex(batch, dir, 0.5)
      assert(!bcast(past), "past-gate batch must plan the shuffled join")
      assert(run(past) == atRows, "gate changes the plan, never the answer")

      // the config override still forces either path regardless of size
      spark.conf.set(forceKey, "true")
      assert(bcast(Dedup.dedupBatchVsIndex(batch, dir, 0.5)))
      spark.conf.set(forceKey, "false")
      spark.conf.set(rowsKey, bandRows.toString)
      assert(!bcast(Dedup.dedupBatchVsIndex(batch, dir, 0.5)))
    } finally {
      spark.conf.unset(rowsKey)
      spark.conf.unset(forceKey)
      spark.conf.set(autoKey, savedAuto)
    }
  }
}

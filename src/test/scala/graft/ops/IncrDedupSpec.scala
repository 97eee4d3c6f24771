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
}

package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental corpus build ([[Pipeline.corpusBuildIncr]]): the
  * gate -> exact-dedup -> near-dup -> append loop over three batches,
  * pinned against a sequential replay built from independently
  * collected primitives (gate verdicts, content hashes, the full LSH
  * pair list) — the loop is an O(batch)-per-step refactoring of the
  * full-corpus pipeline, never a different answer. Plus: the standing
  * state (hash set + index) must mirror the kept corpus exactly after
  * the last batch, and the fixture must exercise every drop path.
  */
class CorpusIncrSpec extends SparkSpec {

  test("3 batches match the sequential replay; standing state mirrors kept") {
    val docs = T(spark, sf, "documents")
    val fix = Pipeline.corpusIncrFixture(docs)

    // independently collected primitives
    val gateOk = Analysis.gopherFilter(fix)
      .filter(col("ok_word_count") && col("ok_mean_word_len") &&
        col("ok_symbol_ratio") && col("ok_alpha_words"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hashOf = fix.select(col("doc_id"), H.hash60(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashPairs(
        fix.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(split(col("text"), " ")) >= 3), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allIds = fix.select("doc_id").collect().map(_.getLong(0))

    // sequential replay
    var standingH = Set.empty[Long]
    var standingIdx = Set.empty[Long]
    var nCrossExact, nSameExact, nCorpusNear, nBatchNear = 0
    val expected = (1 to Pipeline.CorpusIncrBatches).map { k =>
      val batch = allIds.filter(d => d % 3 == k - 1).sorted
      val quality = batch.filter(gateOk)
      val exact = scala.collection.mutable.ArrayBuffer.empty[Long]
      val seenH = scala.collection.mutable.Set.empty[Long]
      quality.foreach { d =>
        val h = hashOf(d)
        if (standingH(h)) nCrossExact += 1
        else if (seenH(h)) nSameExact += 1
        else { seenH += h; exact += d }
      }
      val exactSet = exact.toSet
      val kept = exact.filter { d =>
        val corpusHit = pairs.exists(p =>
          (p._1 == d && standingIdx(p._2)) ||
            (p._2 == d && standingIdx(p._1)))
        val batchHit = pairs.exists(p => p._2 == d && exactSet(p._1))
        if (corpusHit) nCorpusNear += 1
        else if (batchHit) nBatchNear += 1
        corpusHit || batchHit
      }.toSet
      val keptIds = exactSet -- kept
      standingH ++= keptIds.map(hashOf)
      standingIdx ++= keptIds
      (k, batch.length.toLong, quality.length.toLong,
        exact.length.toLong, keptIds.size.toLong)
    }

    val dir = Files.createTempDirectory("graft-corpus-incr-spec").toString
    val res = Pipeline.corpusBuildIncr(docs, dir, 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(res.toSeq == expected)

    // every drop path occurs by fixture construction: cross-batch and
    // within-batch exact copies, standing-index and within-batch
    // near-dups (see CopyIdOffset* / VariantIdOffset residue design)
    assert(nCrossExact > 0, "no cross-batch exact dup hit the hash set")
    assert(nSameExact > 0, "no within-batch exact keep-first fired")
    assert(nCorpusNear > 0, "no near-dup resolved against the index")
    assert(nBatchNear > 0, "no within-batch near keep-first fired")
    // something must survive every stage (the gate itself is a no-op
    // on this clean synthetic corpus — its drop behavior is pinned by
    // the gopherFilter oracle; here it must only never ADD docs)
    assert(expected.map(_._5).sum > 0)
    assert(expected.forall(r => r._3 <= r._2))

    // the standing state mirrors the kept corpus exactly
    val idxIds = Dedup.readIndexBands(spark, s"$dir/lsh")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxIds == standingIdx)
    val hs = Manifest.readTable(spark, s"$dir/hashes")
      .collect().map(_.getLong(0))
    assert(hs.length == hs.distinct.length, "hash table has duplicates")
    assert(hs.toSet == standingH)
    // versioned: bootstrap v1 + one commit per batch, on both tables
    assert(Manifest.currentVersion(spark, s"$dir/lsh/bands")
      .contains(1 + Pipeline.CorpusIncrBatches))
    assert(Manifest.currentVersion(spark, s"$dir/hashes")
      .contains(1 + Pipeline.CorpusIncrBatches))
  }

  test("loop-maintained BM25 index probe == full recompute over the kept corpus") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-corpus-bm25-spec").toString
    val viaIndex = Pipeline.corpusBuildIncrBm25(docs, dir, 0.5, 10, 3)
      .collect().map(_.toSeq).toSeq

    // the kept corpus, derived from the standing state the loop left
    // behind (its membership is pinned against the sequential replay
    // by the test above); score it from scratch with the recompute op
    val keptIds = Dedup.readIndexBands(spark, s"$dir/lsh")
      .select("doc_id").distinct()
    val kept = Pipeline.corpusIncrFixture(docs).join(keptIds, "doc_id")
      .select("doc_id", "text")
    val recompute = Analysis.bm25TopDocs(kept, 10, 3)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex == recompute)
    // one bootstrap + one versioned append per batch on the bm25 table
    assert(Bm25Index.version(spark, s"$dir/bm25")
      .contains(1 + Pipeline.CorpusIncrBatches))
  }

  test("keep-best loop: BM25 index mirrors the post-replacement standing corpus") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-kb-bm25-spec").toString
    val viaIndex = Pipeline.corpusKeepBestBm25(docs, dir, 0.5, 10, 3)
      .collect().map(_.toSeq).toSeq

    // replacements must have FIRED — some LSH-indexed base doc was
    // displaced (DV-subtracted from the band table) — or the
    // composition is untested. (Band membership is not the full
    // standing corpus: a doc too short to shingle has no band rows,
    // which is why the BM25 assertions below use the index's own live
    // set; the true membership recursion is the DuckDB oracle's job.)
    val bandsLive = Dedup.readIndexBands(spark, s"$dir/lsh")
      .select("doc_id").distinct()
    val baseBanded = Dedup.incrLoopBase(docs).select("doc_id")
      .intersect(Dedup.readIndexBands(spark, s"$dir/lsh",
        version = Some(1)).select("doc_id").distinct())
    val displaced = baseBanded
      .join(bandsLive, Seq("doc_id"), "left_anti")
    assert(displaced.count() > 0,
      "no base doc was displaced — the fixture exercises no replacement")

    // INTERNAL CONSISTENCY of the mutated BM25 index: its derived
    // statistics (df/dl/n_docs after the negative corrections) must
    // be exactly what a from-scratch recompute over its OWN live docs
    // produces — any drift in the correction rows shows up here
    val t = Manifest.readTable(spark, s"$dir/bm25/index")
    val live = t.filter(col("kind") === "post").select("doc_id")
      .distinct()
      .join(t.filter(col("kind") === "del").select("doc_id"),
        Seq("doc_id"), "left_anti")
    val kept = Dedup.corpusWithVariants(docs)
      .join(live, "doc_id")
      .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
    val recompute = Analysis.bm25TopDocs(kept, 10, 3)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex == recompute)

    // and the un-index path actually ran: the displaced docs' postings
    // are tombstoned (or flushed) — they never score
    val liveDisplaced = live.join(displaced, Seq("doc_id"), "left_semi")
      .count()
    assert(liveDisplaced == 0,
      "displaced docs still have live (un-tombstoned) postings")
  }

  test("exact-stage hash gate: under-threshold broadcasts, one-past shuffles, same survivors") {
    val gateKey = "spark.graft.incrHashBroadcastRows"
    val docs = T(spark, sf, "documents")
    val fix = Pipeline.corpusIncrFixture(docs)
    val firsts = fix.select(col("doc_id"), H.hash60(col("text")).as("h"))
    val standing = firsts.filter(col("doc_id") % 5 === 0).select("h")
    val nBatch = firsts.count()
    try {
      // stats-based auto-broadcast OFF: what this pins is the HINT —
      // under the gate our code hints the broadcast; past it no hint
      // survives (Catalyst may still broadcast a genuinely small
      // standing side from its own stats, which is fine and not ours
      // to suppress)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // UNDER the gate: the batch's distinct hashes broadcast into the
      // standing scan — the anti-join must be a BroadcastHashJoin with
      // the standing table never on a shuffle edge
      spark.conf.set(gateKey, nBatch.toString)
      val under = Pipeline.exactVsStanding(firsts, standing, nBatch)
      val pUnder = under.queryExecution.executedPlan.toString
      assert(pUnder.contains("BroadcastHashJoin"), pUnder.take(2000))
      // ONE PAST the gate: automatic shuffled fallback — no broadcast
      // hint survives, the anti-join runs on shuffled exchanges
      spark.conf.set(gateKey, (nBatch - 1).toString)
      val past = Pipeline.exactVsStanding(firsts, standing, nBatch)
      val pPast = past.queryExecution.executedPlan.toString
      assert(!pPast.contains("BroadcastHashJoin") &&
        !pPast.contains("BroadcastExchange"), pPast.take(2000))
      // survivors bit-identical in both directions
      val a = under.collect().map(_.toSeq).toSet
      val b = past.collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
      assert(under.select("doc_id").collect()
        .forall(_.getLong(0) % 5 != 0))
    } finally {
      spark.conf.unset(gateKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

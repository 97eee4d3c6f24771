package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The full incremental-ingest loop ([[Dedup.dedupIncrLoop]]):
  * build -> (probe -> append kept) x 3, pinned bit-equal to what ONE
  * full-corpus LSH run decides under the same sequential keep-first
  * semantics; plus the maintenance ops around it (geometry-checked
  * append, per-bucket compaction).
  */
class IncrLoopSpec extends SparkSpec {

  test("3 sequential batches' decisions == one full-corpus LSH run") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-incr-loop-spec").toString
    val res = Dedup.dedupIncrLoop(docs, dir, 0.5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // ground truth: the full pair list, replayed with the loop's
    // sequential semantics (batch k dedups against base + kept(<k),
    // then keep-first within the batch)
    val pairs = Dedup.minhashPairs(Dedup.corpusWithVariants(docs), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchOf = (1 to Dedup.IncrLoopBatches).flatMap { k =>
      Dedup.incrLoopBatch(docs, k).select("doc_id")
        .collect().map(_.getLong(0) -> k)
    }.toMap
    var index = Dedup.incrLoopBase(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (1 to Dedup.IncrLoopBatches).flatMap { k =>
      val ids = batchOf.collect { case (d, `k`) => d }.toSeq.sorted
      val decisions = ids.map { d =>
        val corpusMatches = pairs.collect {
          case (a, b) if a == d && index(b) => b
          case (a, b) if b == d && index(a) => a
        }
        val batchMatches = pairs.collect {
          case (a, b) if b == d && batchOf.get(a).contains(k) => a
        }
        if (corpusMatches.nonEmpty) (k, d, "dup_corpus", corpusMatches.min)
        else if (batchMatches.nonEmpty) (k, d, "dup_batch", batchMatches.min)
        else (k, d, "kept", -1L)
      }
      index ++= decisions.collect { case (_, d, "kept", _) => d }
      decisions
    }
    assert(res.toSeq == expected)

    // the fixture guarantees every decision path — including the one
    // the loop exists for: a dup_corpus whose keeper was APPENDED by
    // an earlier batch, not in the base index
    val base = Dedup.incrLoopBase(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(res.map(_._3).toSet == Set("dup_corpus", "dup_batch", "kept"))
    assert(res.exists(r => r._3 == "dup_corpus" && !base(r._4)),
      "no dup_corpus resolved against an appended doc — append is dead")
  }

  test("append checks the geometry sidecar; compaction shrinks files, not rows") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-lshidx-maint").toString
    Dedup.lshIndexBuild(Dedup.incrLoopBase(docs), dir)

    // appending under a mismatched geometry must hard-fail
    val geo = new java.io.File(s"$dir/geometry")
    val crc = new java.io.File(s"$dir/.geometry.crc")
    val orig = new String(java.nio.file.Files.readAllBytes(geo.toPath))
    def tamper(text: String): Unit = {
      // drop the local-FS checksum sidecar too, or the read fails on
      // ChecksumException before the geometry check even runs
      java.nio.file.Files.write(geo.toPath, text.getBytes)
      if (crc.exists()) crc.delete()
    }
    tamper("bands=9 buckets=7 sig=3")
    val ex = intercept[IllegalArgumentException] {
      Dedup.lshIndexAppend(Dedup.incrLoopBatch(docs, 1), dir)
    }
    assert(ex.getMessage.contains("geometry"))
    tamper(orig)

    // several appends accumulate small files per bucket — each one a
    // versioned manifest commit (build = v1, appends = v2..v4)
    (1 to Dedup.IncrLoopBatches).foreach { k =>
      Dedup.lshIndexAppend(Dedup.incrLoopBatch(docs, k), dir)
    }
    assert(Dedup.lshIndexVersion(spark, dir)
      .contains(1 + Dedup.IncrLoopBatches))
    def parquetFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory && f.getName != Manifest.DirName)
          f.listFiles.toSeq.flatMap(walk)
        else if (f.isDirectory) Seq.empty // metadata, not index data
        else Seq(f)
      walk(new java.io.File(s"$dir/bands"))
        .count(_.getName.endsWith(".parquet"))
    }
    def liveFiles: Int = Manifest
      .read(spark, s"$dir/bands").get.size
    def rows = Dedup.readIndexBands(spark, dir)
      .groupBy("doc_id", "band").count()
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sorted.toSeq
    val before = rows
    val filesBefore = liveFiles

    // ...compaction folds them back to ~one per bucket with the exact
    // same row multiset — a METADATA swap: superseded files survive on
    // disk (time travel) until vacuum reclaims them
    Dedup.lshIndexCompact(spark, dir)
    assert(rows == before, "compaction changed the index contents")
    val filesAfter = liveFiles
    assert(filesAfter < filesBefore,
      s"expected fewer live files after compaction: $filesBefore -> $filesAfter")
    val onDiskBefore = parquetFiles
    assert(onDiskBefore > filesAfter,
      "superseded files should survive on disk until vacuum")
    assert(Dedup.lshIndexVacuum(spark, dir, keepVersions = 1) > 0)
    assert(parquetFiles == filesAfter,
      "vacuum should leave exactly the live snapshot's files")
    assert(rows == before, "vacuum changed the index contents")
  }

  test("auto-compaction cadence: crossing the per-bucket file budget triggers exactly one OPTIMIZE") {
    val confKey = "spark.graft.autoCompactFilesPerDir"
    val docs = T(spark, sf, "documents")
    // baseline decisions under the default cadence (never triggers at
    // 4 files/bucket: build + 3 appends)
    val dirA = Files.createTempDirectory("graft-autocompact-a").toString
    val base = Dedup.dedupIncrLoop(docs, dirA, 0.5).collect().map(_.toSeq)
    assert(!Manifest.history(spark, s"$dirA/bands").map(_.operation)
      .contains("OPTIMIZE"))
    try {
      // budget 2: build(1/bucket) -> append1(2) -> append2(3 > 2:
      // compact inside the append) -> append3(2). Exactly one
      // OPTIMIZE commit, decisions bit-identical.
      spark.conf.set(confKey, "2")
      val dirB = Files.createTempDirectory("graft-autocompact-b").toString
      val gated = Dedup.dedupIncrLoop(docs, dirB, 0.5).collect().map(_.toSeq)
      assert(gated.toSeq == base.toSeq,
        "auto-compaction must never change decisions")
      val ops = Manifest.history(spark, s"$dirB/bands").map(_.operation)
      assert(ops.count(_ == "OPTIMIZE") == 1,
        s"expected exactly one compaction commit, got $ops")
      // the budget is restored: no bucket carries more files than the
      // cadence allows +1 (the append that will trigger next time)
      assert(Layout.maxFilesPerDir(spark, s"$dirB/bands") <= 2)
    } finally spark.conf.unset(confKey)
  }

  test("bootstrap: empty standing corpus, empty batches — no crash") {
    val docs = T(spark, sf, "documents")
    val none = docs.filter(col("doc_id") < 0)

    // an index built over ZERO docs (first day of ingest) writes no
    // part files; the explicit IndexSchema keeps it readable
    val dir = Files.createTempDirectory("graft-lshidx-empty").toString
    Dedup.lshIndexBuild(Dedup.incrLoopBase(none), dir)
    val firstBatch = Dedup.incrLoopBatch(docs, 1)
    val dec = Dedup.dedupBatchVsIndex(firstBatch, dir, 0.5).collect()
    assert(dec.nonEmpty)
    assert(!dec.exists(_.getString(1) == "dup_corpus"),
      "nothing can be a corpus dup against an empty index")

    // an empty BATCH against a real index is a no-op, not an error
    val dir2 = Files.createTempDirectory("graft-lshidx-emptyb").toString
    Dedup.lshIndexBuild(Dedup.incrLoopBase(docs), dir2)
    assert(Dedup.dedupBatchVsIndex(Dedup.incrLoopBatch(none, 1), dir2, 0.5)
      .count() == 0)

    // the whole loop over an empty corpus returns empty
    val dir3 = Files.createTempDirectory("graft-lshidx-emptyall").toString
    assert(Dedup.dedupIncrLoop(none, dir3, 0.5).count() == 0)
  }
}

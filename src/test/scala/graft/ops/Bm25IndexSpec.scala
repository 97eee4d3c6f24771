package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted BM25 inverted index (round-16 verdict #3): built
  * once, appended per ingest batch (df/dl partials merge additively),
  * probed without re-tokenizing the corpus — and bit-equal to the
  * full-recompute scorer in any batch split, because every persisted
  * statistic is an exact long sum and the score expression is shared
  * literal for literal.
  */
class Bm25IndexSpec extends SparkSpec {

  private def docs = T(spark, sf, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("build+append probe is bit-equal to the full recompute (both shapes)") {
    val dir = Files.createTempDirectory("graft-bm25-idx").toString
    Bm25Index.build(docs.filter(col("doc_id") % 2 === 0), dir)
    assert(Bm25Index.version(spark, dir).contains(1))
    Bm25Index.append(docs.filter(col("doc_id") % 2 === 1), dir)
    assert(Bm25Index.version(spark, dir).contains(2))

    assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
      rows(Analysis.bm25TopDocs(docs, 20, 3)))
    assert(rows(Bm25Index.query(spark, dir, 5, 3, 3)) ==
      rows(Analysis.bm25Query(docs, 5, 3, 3)))
  }

  test("three-way split matches too — additivity is split-invariant") {
    val dir = Files.createTempDirectory("graft-bm25-idx3").toString
    Bm25Index.build(docs.filter(col("doc_id") % 3 === 0), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 1), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 2), dir)
    assert(Bm25Index.version(spark, dir).contains(3))
    assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
      rows(Analysis.bm25TopDocs(docs, 20, 3)))
  }

  test("probe pinned to a version is stable while an append commits") {
    val dir = Files.createTempDirectory("graft-bm25-pin").toString
    Bm25Index.build(docs.filter(col("doc_id") % 2 === 0), dir)
    val atV1 = rows(Bm25Index.topDocs(spark, dir, 10, 2))
    Bm25Index.append(docs.filter(col("doc_id") % 2 === 1), dir)
    assert(rows(Bm25Index.topDocs(spark, dir, 10, 2,
      version = Some(1))) == atV1)
    assert(rows(Bm25Index.topDocs(spark, dir, 10, 2)) != atV1,
      "a current-version probe must see the appended batch")
  }

  test("compact folds files, preserves results; vacuum keeps the index live") {
    val dir = Files.createTempDirectory("graft-bm25-compact").toString
    Bm25Index.build(docs.filter(col("doc_id") % 3 === 0), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 1), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 2), dir)
    val before = rows(Bm25Index.query(spark, dir, 5, 3, 3))
    val (nBefore, nAfter) = Bm25Index.compact(spark, dir)
    assert(nAfter < nBefore, s"compact should fold files: $nBefore -> $nAfter")
    assert(rows(Bm25Index.query(spark, dir, 5, 3, 3)) == before)
    assert(Bm25Index.vacuum(spark, dir, keepVersions = 1) > 0)
    assert(rows(Bm25Index.query(spark, dir, 5, 3, 3)) == before)
  }

  test("optimizeStats folds df/stat partials; probes unchanged; postings untouched") {
    val dir = Files.createTempDirectory("graft-bm25-opt").toString
    Bm25Index.build(docs.filter(col("doc_id") % 3 === 0), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 1), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 3 === 2), dir)
    def kindCount(k: String) = Manifest
      .readTable(spark, s"$dir/index").filter(col("kind") === k).count()
    val before = rows(Bm25Index.topDocs(spark, dir, 20, 3))
    val postBefore = kindCount("post")
    val dfBefore = kindCount("df")
    val distinctTokens = Manifest.readTable(spark, s"$dir/index")
      .filter(col("kind") === "df").select("token").distinct().count()
    assert(dfBefore > distinctTokens,
      "fixture must actually accumulate partials across the 3 batches")

    Bm25Index.optimizeStats(spark, dir): Unit
    assert(kindCount("df") == distinctTokens)
    assert(kindCount("stat") == 1)
    assert(kindCount("post") == postBefore)
    assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) == before)
    // a LATER append still merges additively on the folded base
    val more = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + 9000000L)
    Bm25Index.append(more, dir)
    val full = docs.unionByName(more)
    assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
      rows(Analysis.bm25TopDocs(full, 20, 3)))
  }

  test("delete un-indexes: probe == recompute over the live corpus only") {
    val dir = Files.createTempDirectory("graft-bm25-del").toString
    val keepSide = docs.filter(col("doc_id") % 4 =!= 3)
    val doomedSide = docs.filter(col("doc_id") % 4 === 3)
    // tombstones stay visible for this test — no auto-flush
    spark.conf.set("spark.graft.bm25.autoFlushRatio", "0")
    try {
      Bm25Index.build(keepSide, dir)
      Bm25Index.append(doomedSide, dir)
      val n = Bm25Index.delete(doomedSide.select("doc_id"), dir)
      assert(n == doomedSide.count())
      // ONE commit carried tombstones + df/stat corrections: v1 build,
      // v2 append, v3 delete — nothing else
      assert(Bm25Index.version(spark, dir).contains(3))
      // bit-equal to a from-scratch recompute over the live docs, for
      // both probe shapes — deleted docs neither score nor skew idf
      assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
        rows(Analysis.bm25TopDocs(keepSide, 20, 3)))
      assert(rows(Bm25Index.query(spark, dir, 5, 3, 3)) ==
        rows(Analysis.bm25Query(keepSide, 5, 3, 3)))
      // double-delete is a no-op (no version bump, answers unchanged)
      assert(Bm25Index.delete(doomedSide.select("doc_id"), dir) == 0L)
      assert(Bm25Index.version(spark, dir).contains(3))
      // a probe pinned BEFORE the delete still sees the full corpus
      assert(rows(Bm25Index.topDocs(spark, dir, 20, 3,
        version = Some(2))) == rows(Analysis.bm25TopDocs(docs, 20, 3)))

      // flush: tombstones retire, postings physically drop, every
      // answer unchanged
      val retired = Bm25Index.flushDeletes(spark, dir)
      assert(retired == n)
      assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
        rows(Analysis.bm25TopDocs(keepSide, 20, 3)))
      val t = Manifest.readTable(spark, s"$dir/index")
      assert(t.filter(col("kind") === "del").count() == 0)
      assert(t.filter(col("kind") === "post")
        .join(doomedSide.select("doc_id"), Seq("doc_id"), "left_semi")
        .count() == 0, "flushed postings must be physically gone")
      // idempotent
      assert(Bm25Index.flushDeletes(spark, dir) == 0L)
    } finally spark.conf.unset("spark.graft.bm25.autoFlushRatio")
  }

  test("delete auto-flushes past the tombstone ratio") {
    val dir = Files.createTempDirectory("graft-bm25-delflush").toString
    Bm25Index.build(docs, dir)
    // default ratio 0.10; delete ~25% of the corpus
    Bm25Index.delete(docs.filter(col("doc_id") % 4 === 3)
      .select("doc_id"), dir)
    val t = Manifest.readTable(spark, s"$dir/index")
    assert(t.filter(col("kind") === "del").count() == 0,
      "a quarter-corpus delete must auto-flush its tombstones")
    assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
      rows(Analysis.bm25TopDocs(docs.filter(col("doc_id") % 4 =!= 3),
        20, 3)))
  }

  test("geometry sidecar gates probes and appends") {
    val dir = Files.createTempDirectory("graft-bm25-geom").toString
    Bm25Index.build(docs.limit(10), dir)
    Dedup.writeSidecar(spark, s"$dir/geometry", "buckets=7 tok=space v0")
    intercept[IllegalArgumentException] {
      Bm25Index.topDocs(spark, dir, 5, 2)
    }
    intercept[IllegalArgumentException] {
      Bm25Index.append(docs.limit(5), dir)
    }
    intercept[RuntimeException] {
      Bm25Index.topDocs(spark,
        Files.createTempDirectory("graft-bm25-nogeom").toString, 5, 2)
    }
  }

  test("no cached blocks leak from build/append/probe") {
    val dir = Files.createTempDirectory("graft-bm25-leak").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Bm25Index.build(docs.filter(col("doc_id") % 2 === 0), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 2 === 1), dir)
    Bm25Index.topDocs(spark, dir, 10, 2).collect(): Unit
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"persisted RDDs leaked: ${after -- before}")
  }

  test("double-delete stays a no-op ACROSS a flush boundary (retired record)") {
    val dir = Files.createTempDirectory("graft-bm25-redel").toString
    val keepSide = docs.filter(col("doc_id") % 4 =!= 3)
    val doomedSide = docs.filter(col("doc_id") % 4 === 3)
    spark.conf.set("spark.graft.bm25.autoFlushRatio", "0")
    try {
      Bm25Index.build(keepSide, dir)
      Bm25Index.append(doomedSide, dir)
      val n = Bm25Index.delete(doomedSide.select("doc_id"), dir)
      assert(n == doomedSide.count())
      assert(Bm25Index.flushDeletes(spark, dir) == n)
      val vAfterFlush = Bm25Index.version(spark, dir).get
      // the advisor's skew: before the retired record, re-deleting a
      // flushed id found no tombstone and decremented n_docs for a doc
      // with no postings — permanently wrong idf/avgdl. Now: no-op.
      assert(Bm25Index.delete(doomedSide.select("doc_id"), dir) == 0L)
      assert(Bm25Index.version(spark, dir).contains(vAfterFlush))
      assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
        rows(Analysis.bm25TopDocs(keepSide, 20, 3)))
      // a SECOND flush after the no-op retires nothing and keeps the
      // retired record intact
      assert(Bm25Index.flushDeletes(spark, dir) == 0L)
      assert(Bm25Index.delete(doomedSide.select("doc_id"), dir) == 0L)
      // fresh deletes of LIVE docs still work normally after a flush
      val more = keepSide.filter(col("doc_id") % 8 === 0)
      assert(Bm25Index.delete(more.select("doc_id"), dir) == more.count())
      val live = keepSide.filter(col("doc_id") % 8 =!= 0)
      assert(rows(Bm25Index.topDocs(spark, dir, 20, 3)) ==
        rows(Analysis.bm25TopDocs(live, 20, 3)))
    } finally spark.conf.unset("spark.graft.bm25.autoFlushRatio")
  }
}

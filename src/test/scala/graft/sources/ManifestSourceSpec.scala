package graft.sources

import graft.SparkSpec
import graft.ops.{Layout, Manifest}
import graft.streaming.ManifestSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The DSv2 streaming source over manifest tables: offsets are
  * manifest versions, batches are the added-file diff — closing the
  * exactly-once loop with [[graft.streaming.ManifestSink]]:
  * MemoryStream → sink (txn-guarded appends) → manifest versions →
  * source → results, with restart/resume and replay accounting.
  */
object ManifestSourceSpec {
  // foreachBatch closure target for the resume test (driver-side)
  val received: scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]
}

class ManifestSourceSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mfsrc-$tag").toString

  test("StringStartsWith prunes on string ranges, never wrongly") {
    import graft.ops.{ColRangeS, ManifestEntry}
    import org.apache.spark.sql.sources.StringStartsWith
    def entry(lo: String, hi: String) =
      ManifestEntry("f.parquet", 10, 100,
        Seq.empty, Some(Seq(ColRangeS("u", lo, hi))))
    def survives(lo: String, hi: String, p: String) =
      ManifestSource.entrySurvives(entry(lo, hi),
        Array(StringStartsWith("u", p)))
    assert(survives("alpha", "beta", "al"))    // prefix inside range
    assert(survives("alpha", "beta", "b"))     // hi starts with p
    assert(!survives("alpha", "beta", "z"))    // hi < p: provably none
    assert(!survives("mango", "peach", "al"))  // lo truncates past p
    assert(survives("mango", "peach", "ma"))
    // boundary: min itself is exactly the prefix
    assert(survives("al", "beta", "al"))
    // a file with no stats for the column is always kept
    assert(ManifestSource.entrySurvives(
      ManifestEntry("f.parquet", 10, 100, Seq.empty, None),
      Array(StringStartsWith("u", "z"))))
    // partition-directory equality on the prefix
    assert(ManifestSource.entrySurvives(
      ManifestEntry("u=alpha/f.parquet", 10, 100, Seq.empty, None),
      Array(StringStartsWith("u", "al"))))
    assert(!ManifestSource.entrySurvives(
      ManifestEntry("u=alpha/f.parquet", 10, 100, Seq.empty, None),
      Array(StringStartsWith("u", "be"))))
  }

  test("a fresh stream consumes the whole table, then follows appends exactly once") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("e2e")

    // v1: the initial table
    docs.filter(col("doc_id") % 3 === 0)
      .repartition(2).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))
    // v2, v3: two appended batches
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id") % 3 === 1), Seq("doc_id"))
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id") % 3 === 2), Seq("doc_id"))

    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("mfsrc_all")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-e2e"))
      .start()
    q.awaitTermination()
    val got = Layout.contentFingerprint(spark.table("mfsrc_all"))
      .collect().toSeq
    val expected = Layout.contentFingerprint(docs).collect().toSeq
    assert(got == expected,
      "the stream must deliver every version's rows exactly once")
  }

  test("restart resumes from the checkpointed version: only NEW appends arrive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("resume")
    val ckpt = tmp("ckpt-resume")

    docs.filter(col("doc_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))

    // foreachBatch sink: the memory sink cannot recover a checkpoint,
    // and restart-resume is exactly what this test pins
    def runOnce(): Seq[Long] = {
      ManifestSourceSpec.received.clear()
      val q = spark.readStream.format("graft.sources.ManifestSource")
        .option("path", dir).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("doc_id").collect().map(_.getLong(0))
          ManifestSourceSpec.received.synchronized {
            ManifestSourceSpec.received ++= ids
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
      ManifestSourceSpec.received.synchronized {
        ManifestSourceSpec.received.toSeq
      }
    }
    val round1 = runOnce()
    assert(round1.size == docs.filter(col("doc_id") < 100).count())

    // append AFTER the first run; the restarted stream (same
    // checkpoint) must deliver ONLY the new batch — version offsets
    // resume, nothing is re-read, nothing is lost
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id").between(100, 150)), Seq("doc_id"))
    val round2 = runOnce()
    assert(round2.size ==
      docs.filter(col("doc_id").between(100, 150)).count(),
      "resume must deliver exactly the appended window")
    assert(round2.forall(_ >= 100))
  }

  test("end-to-end exactly-once: ManifestSink ingests, ManifestSource consumes") {
    import spark.implicits._
    val dir = tmp("loop")
    // seed the table so the sink has a schema to align to
    Seq((0L, "seed")).toDF("id", "tag")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("id"))

    val in = MemoryStream[Long](spark)
    val ingest = ManifestSink.start(
      in.toDF().select(col("value").as("id"), lit("live").as("tag")),
      dir, tmp("ckpt-sink"), Seq("id"))
    in.addData(1L to 50L: _*)
    ingest.processAllAvailable()
    in.addData(51L to 80L: _*)
    ingest.processAllAvailable()
    ingest.stop()

    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("mfsrc_loop")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-loop"))
      .start()
    q.awaitTermination()
    val got = spark.table("mfsrc_loop")
    assert(got.count() == 81, s"seed + 80 ingested, got ${got.count()}")
    assert(got.filter(col("tag") === "live").count() == 80)
    // txn guard: the sink recorded its last batch id in the pointer
    assert(Manifest.lastTxn(spark, dir).nonEmpty)
  }

  test("maxVersionsPerBatch bounds catch-up: one commit window per micro-batch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("rate")
    docs.filter(col("doc_id") % 3 === 0)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id") % 3 === 1), Seq("doc_id"))
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id") % 3 === 2), Seq("doc_id"))

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).option("maxVersionsPerBatch", "1").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        batchSizes.synchronized { batchSizes += n }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-rate"))
      .start()
    q.awaitTermination()
    val sizes = batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0)
    // three committed versions -> three bounded batches, no giant read
    assert(sizes.size == 3,
      s"expected one batch per commit window, got $sizes")
    assert(sizes.sum == docs.count(),
      "bounded catch-up must still deliver every row exactly once")
  }

  test("Hive-partitioned tables stream with partition columns reconstructed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("part")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").partitionBy("source").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id") % 2 === 1), Seq("doc_id"))

    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("mfsrc_part")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-part"))
      .start()
    q.awaitTermination()
    val got = spark.table("mfsrc_part")
    assert(got.columns.contains("source"),
      "the partition column must be reconstructed from the path")
    assert(Layout.contentFingerprint(got).collect().toSeq ==
      Layout.contentFingerprint(docs).collect().toSeq,
      "partitioned streaming must deliver every row with its " +
        "partition value intact")
  }

  test("batch read through the connector: snapshot, versionAsOf, timestampAsOf") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("batch")
    docs.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))                       // v1
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(20)
    Layout.deleteMergeOnRead(spark, dir,
      col("doc_id").between(10, 30), Seq("doc_id"))                  // v2

    def readFmt(opts: (String, String)*) = {
      val r = spark.read.format("graft.sources.ManifestSource")
        .option("path", dir)
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
        .load()
    }
    // current snapshot: DV subtracted, equals readTable
    assert(Layout.contentFingerprint(readFmt()).collect().toSeq ==
      Layout.contentFingerprint(Manifest.readTable(spark, dir))
        .collect().toSeq)
    // version time travel: the pre-delete table
    assert(Layout.contentFingerprint(readFmt("versionAsOf" -> "1"))
      .collect().toSeq ==
      Layout.contentFingerprint(docs).collect().toSeq)
    // timestamp time travel resolves to the version live then
    assert(Layout.contentFingerprint(
        readFmt("timestampAsOf" -> afterV1.toString)).collect().toSeq ==
      Layout.contentFingerprint(docs).collect().toSeq)
  }

  test("startingVersion skips history: backfill-then-follow consumes later commits only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("sv")
    docs.filter(col("doc_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))                       // v1
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id").between(100, 120)), Seq("doc_id"))   // v2
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id").between(121, 140)), Seq("doc_id"))   // v3

    // a consumer that bulk-read v1 follows from there: only v2+v3 flow
    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("mfsrc_sv")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-sv"))
      .start()
    q.awaitTermination()
    val got = spark.table("mfsrc_sv")
    assert(got.count() ==
      docs.filter(col("doc_id").between(100, 140)).count())
    assert(got.agg(min("doc_id")).head().getLong(0) >= 100,
      "the backfilled history must not restream")
  }

  test("changeFeed option streams per-commit change records, not snapshots") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("cf")
    docs.filter(col("doc_id") < 100)
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))                       // v1
    Layout.deleteInPlace(spark, dir,
      col("doc_id").between(10, 19), Seq("doc_id"))                  // v2
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id").between(100, 110)), Seq("doc_id"))   // v3

    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).option("changeFeed", "true").load()
      .writeStream.format("memory").queryName("mfsrc_cf")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-cf"))
      .start()
    q.awaitTermination()
    val got = spark.table("mfsrc_cf").cache()
    assert(got.columns.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
    // v1: the initial table as inserts; v2: ten deletes (the change
    // record, NOT the rewritten survivors); v3: the appended inserts
    assert(got.filter(col("_commit_version") === 1 &&
      col("_change_type") === "insert").count() == 100)
    val v2 = got.filter(col("_commit_version") === 2)
    assert(v2.count() == 10 &&
      v2.filter(col("_change_type") =!= "delete").count() == 0,
      "the rewrite window must stream its change record only")
    assert(got.filter(col("_commit_version") === 3 &&
      col("_change_type") === "insert").count() == 11)
    got.unpersist()
  }

  test("evolution inside the stream window NULL-backfills; DV marks are skipped") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val dir = tmp("ev")
    docs.filter(col("doc_id") < 50)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("doc_id"))
    // an evolved append (new column) and a merge-on-read delete both
    // land before the stream starts
    Layout.appendInPlace(spark, dir,
      docs.filter(col("doc_id").between(50, 60))
        .withColumn("rev_tag", lit("e1")), Seq("doc_id"))
    Layout.deleteMergeOnRead(spark, dir,
      col("doc_id").between(10, 20), Seq("doc_id"))

    val q = spark.readStream.format("graft.sources.ManifestSource")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("mfsrc_ev")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt-ev"))
      .start()
    q.awaitTermination()
    val got = spark.table("mfsrc_ev")
    assert(got.columns.contains("rev_tag"))
    assert(got.filter(col("doc_id") < 50 &&
      col("rev_tag").isNotNull).count() == 0,
      "pre-evolution files must NULL-backfill the new column")
    assert(got.filter(col("rev_tag") === "e1").count() == 11)
    assert(got.filter(col("doc_id").between(10, 20)).count() == 0,
      "DV-marked rows must not stream")
    assert(got.count() ==
      Manifest.readTable(spark, dir).count())
  }
}

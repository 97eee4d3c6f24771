package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.{Layout, Manifest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** DataFrame-writer symmetry into the catalog: SQL tables must be
  * reachable from the DataFrame API exactly like reads —
  * `df.writeTo(t).append()`, `overwritePartitions()`, and streaming
  * `writeStream.toTable` — plus the deletion-vector AUTO-FLUSH policy
  * and concurrent SQL writers racing through the rename arbiter.
  */
class WriterSymmetrySpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-wsym").toString
    spark.conf.set("spark.sql.catalog.gws", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gws.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gws.db")
    d
  }

  test("df.writeTo(t).append() lands as an append snapshot") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.wt AS " +
      "SELECT id, concat('v', id) AS tag FROM range(50)")
    (50L until 80L).map(i => (i, s"v$i")).toDF("id", "tag")
      .writeTo("gws.db.wt").append()
    assert(spark.table("gws.db.wt").count() == 80)
    assert(spark.sql("SELECT tag FROM gws.db.wt WHERE id = 70")
      .as[String].head() == "v70")
    // it was a true append commit: both versions time-travel
    val dir = s"$wh/db/wt"
    assert(Manifest.currentVersion(spark, dir).get >= 2)
  }

  test("df.writeTo(t).overwritePartitions() replaces only touched partitions") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.part (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp)")
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "grp").writeTo("gws.db.part").append()
    // overwrite ONLY partitions a and b; c must survive untouched
    Seq((10L, "a"), (11L, "b")).toDF("id", "grp")
      .writeTo("gws.db.part").overwritePartitions()
    val out = spark.table("gws.db.part")
      .select("id", "grp").as[(Long, String)].collect().toSet
    assert(out == Set((10L, "a"), (11L, "b"), (4L, "c")))
  }

  test("writeStream.toTable commits epochs exactly-once into the table") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.st (id BIGINT, tag STRING)")
    val ckpt = Files.createTempDirectory("graft-wsym-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().select(col("value").as("id"),
        concat(lit("s"), col("value")).as("tag"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable("gws.db.st")
    mem.addData(1L, 2L, 3L)
    q.processAllAvailable()
    assert(spark.table("gws.db.st").count() == 3)
    mem.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("gws.db.st")
      .select("id", "tag").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "s1"), (2L, "s2"), (3L, "s3"),
      (4L, "s4"), (5L, "s5")))
    // epochs recorded as txns → a restart from the same checkpoint
    // replays nothing (the manifest remembers the last epoch)
    val dir = s"$wh/db/st"
    assert(Manifest.lastTxn(spark, dir).nonEmpty)
  }

  test("toTable restart from the same checkpoint replays no epoch") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.rst (id BIGINT)")
    val ckpt = Files.createTempDirectory("graft-wsym-rst").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val q1 = mem.toDF().select(col("value").as("id"))
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gws.db.rst")
    mem.addData(1L, 2L)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.table("gws.db.rst").count() == 2)
    // a NEW query from the same checkpoint: committed epochs must not
    // re-apply (the manifest's txn guard absorbs any re-delivery)
    val q2 = mem.toDF().select(col("value").as("id"))
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("gws.db.rst")
    mem.addData(3L)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table("gws.db.rst").select("id").as[Long]
      .collect().toSeq.sorted == Seq(1L, 2L, 3L))
  }

  test("two streams with txnAppId share one table without replay suppression") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.duo (id BIGINT, src STRING)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memA = MemoryStream[Long]
    val memB = MemoryStream[Long]
    def writer(mem: MemoryStream[Long], tag: String) =
      mem.toDF().select(col("value").as("id"), lit(tag).as("src"))
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-duo-$tag").toString)
        .option("txnAppId", s"duo-$tag")
        .toTable("gws.db.duo")
    val qA = writer(memA, "a")
    val qB = writer(memB, "b")
    // A races ahead: its epochs reach 3 while B still sits at 0 —
    // under a GLOBAL txn max, B's first commit would silently no-op
    memA.addData(1L); qA.processAllAvailable()
    memA.addData(2L); qA.processAllAvailable()
    memA.addData(3L); qA.processAllAvailable()
    memB.addData(100L); qB.processAllAvailable()
    memB.addData(101L); qB.processAllAvailable()
    memA.addData(4L); qA.processAllAvailable()
    qA.stop(); qB.stop()
    val rows = spark.table("gws.db.duo")
      .select("id", "src").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (100L, "b"), (101L, "b")),
      s"a stream's batches were suppressed: $rows")
  }

  test("overwritePartitions on an UNPARTITIONED table fails instead of clobbering it") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.flat (id BIGINT, tag STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .writeTo("gws.db.flat").append()
    val e = intercept[Throwable] {
      Seq((9L, "z")).toDF("id", "tag")
        .writeTo("gws.db.flat").overwritePartitions()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("unpartitioned")), s"got: $e")
    // the existing rows survive untouched
    assert(spark.table("gws.db.flat").select("id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("a NEW query with a FRESH checkpoint appends instead of self-suppressing") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.fresh (id BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // query 1 advances the table's txn watermark past 0
    val mem1 = MemoryStream[Long]
    val q1 = mem1.toDF().select(col("value").as("id"))
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-fresh-ck1").toString)
      .toTable("gws.db.fresh")
    mem1.addData(1L); q1.processAllAvailable()
    mem1.addData(2L); q1.processAllAvailable()
    q1.stop()
    assert(spark.table("gws.db.fresh").count() == 2)
    // a BRAND-NEW query (fresh checkpoint → epochs restart at 0) must
    // not mistake its first epochs for replays of the old query's —
    // the failure mode was silent deletion of its staged files
    val mem2 = MemoryStream[Long]
    val q2 = mem2.toDF().select(col("value").as("id"))
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-fresh-ck2").toString)
      .toTable("gws.db.fresh")
    mem2.addData(10L); q2.processAllAvailable()
    mem2.addData(11L); q2.processAllAvailable()
    q2.stop()
    assert(spark.table("gws.db.fresh").select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 10L, 11L),
      "the new query's early epochs were silently swallowed")
  }

  test("staged append claims its version BEFORE landing files; loser keeps its staging intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wsym-claim").toString
    (0L until 20L).map(i => (i, s"d$i")).toDF("id", "txt")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("id"))                   // v1
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def stage(tag: String, lo: Long): String = {
      val t = Files.createTempDirectory(s"graft-stg-$tag").toString
      (lo until lo + 5L).map(i => (i, s"$tag$i")).toDF("id", "txt")
        .coalesce(1).write.mode("overwrite").parquet(t)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(t))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = s"$dir/.staged-$tag.parquet"
      fs.rename(part, new org.apache.hadoop.fs.Path(dst))
      dst
    }
    val stagedB = stage("b", 100L)
    // writer A holds the v2 claim: B's commit must fail BEFORE any
    // rename — under the old order B would land deterministic
    // append-v2-* names that A's files then collide with
    val claimA = Manifest.claimVersion(spark, dir, 2)
    intercept[java.util.ConcurrentModificationException] {
      Layout.commitStagedAppend(spark, dir, Seq(stagedB), None, Seq("id"))
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(stagedB)),
      "loser's staged file must survive for its retry")
    assert(Manifest.currentVersion(spark, dir).contains(1))
    // A finishes; B retries at the next version and lands cleanly
    Manifest.write(spark, dir, Manifest.read(spark, dir).get, 2,
      claim = Some(claimA))
    assert(Layout.commitStagedAppend(spark, dir, Seq(stagedB), None,
      Seq("id")) == 1)
    val landed = Manifest.read(spark, dir).get.map(_.name)
      .filter(_.startsWith("append-v3"))
    assert(landed.size == 1 &&
      landed.head.matches("append-v3-[0-9a-f]{8}-0\\.parquet"),
      s"landed name must embed the claim id: $landed")
    assert(Manifest.readTable(spark, dir).count() == 25)
  }

  test("deletion vectors auto-flush past the marks-to-rows threshold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-wsym-flush").toString
    (0L until 1000L).map(i => (i, s"d$i")).toDF("id", "txt")
      .repartition(4).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("id"))
    // 5% marked: below the 10% default — vector stays
    Layout.deleteMergeOnRead(spark, dir, col("id") < 50, Seq("id"))
    assert(Manifest.hasDeletionVectors(spark, dir))
    // push past 10%: the policy flushes in its own commit
    Layout.deleteMergeOnRead(spark, dir,
      col("id") >= 50 && col("id") < 150, Seq("id"))
    assert(!Manifest.hasDeletionVectors(spark, dir),
      "vector should have auto-flushed past the ratio")
    assert(Manifest.readTable(spark, dir).count() == 850)
    // sustained deletes: marks stay bounded by the ratio forever
    (0 until 6).foreach { k =>
      Layout.deleteMergeOnRead(spark, dir,
        col("id") >= 150 + k * 100 && col("id") < 150 + k * 100 + 100,
        Seq("id"))
      val v = Manifest.currentVersion(spark, dir).get
      val marks = Manifest.dvMarks(spark, dir, v).count()
      val rows = Manifest.read(spark, dir).get.map(_.rows).sum
      assert(rows == 0 || marks <= 0.10 * rows + 100,
        s"round $k: $marks marks on $rows rows — unbounded growth")
    }
    assert(Manifest.readTable(spark, dir).count() == 250)
  }

  test("multi-writer soak: two txnAppId streams + batch DELETEs, killed and restarted mid-epoch") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.soak (id BIGINT, src STRING)")
    spark.sql(
      "INSERT INTO gws.db.soak SELECT id, 'seed' FROM range(100)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val memA = MemoryStream[Long]
    val memB = MemoryStream[Long]
    val ckA = Files.createTempDirectory("graft-soak-cka").toString
    val ckB = Files.createTempDirectory("graft-soak-ckb").toString
    def start(mem: MemoryStream[Long], tag: String, ckpt: String) =
      mem.toDF().select(col("value").as("id"), lit(tag).as("src"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .option("txnAppId", s"soak-$tag")
        .toTable("gws.db.soak")
    // Drive `epochs` batches through the sink. A lost commit race
    // surfaces as a FAILED QUERY (the claim arbiter throws mid-epoch)
    // — exactly a kill — and the recovery contract is: restart from
    // the same checkpoint and let the app-scoped watermark absorb the
    // replay. `killAt` additionally stops the query with a batch
    // ADDED BUT UNCOMMITTED, the crash case where data is in flight.
    def drive(mem: MemoryStream[Long], tag: String, ckpt: String,
        lo: Long, epochs: Int, killAt: Int): Int = {
      var restarts = 0
      var q = start(mem, tag, ckpt)
      (0 until epochs).foreach { e =>
        mem.addData(lo + e)
        if (e == killAt) {
          q.stop(); restarts += 1; q = start(mem, tag, ckpt)
        }
        var committed = false
        while (!committed) {
          try { q.processAllAvailable(); committed = true }
          catch { case _: Throwable =>
            try q.stop() catch { case _: Throwable => () }
            restarts += 1
            Thread.sleep(100L * math.min(restarts, 5))
            q = start(mem, tag, ckpt)
          }
        }
      }
      q.stop()
      restarts
    }
    def isConflict(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.util.ConcurrentModificationException] ||
        (t.getMessage != null &&
          (t.getMessage.contains("moved from") ||
            t.getMessage.contains("another writer") ||
            t.getMessage.contains("retry"))) ||
        isConflict(t.getCause))
    def retryingSql(sql: String, tries: Int = 60): Unit = {
      var n = 0
      var done = false
      while (!done) {
        try { spark.sql(sql).collect(); done = true }
        catch {
          case e: Throwable if n < tries && isConflict(e) =>
            n += 1; Thread.sleep(math.min(500L, 50L * n))
        }
      }
    }
    val fA = Future(drive(memA, "a", ckA, 1000L, 6, 3))
    val fB = Future(drive(memB, "b", ckB, 2000L, 6, -1))
    val fDel = Future {
      (0 until 5).foreach { k =>
        retryingSql("DELETE FROM gws.db.soak WHERE src = 'seed' AND " +
          s"id >= ${k * 20} AND id < ${k * 20 + 20}")
        Thread.sleep(50)
      }
    }
    val rA = Await.result(fA, 300.seconds)
    val rB = Await.result(fB, 300.seconds)
    Await.result(fDel, 300.seconds)
    info(s"soak restarts: stream a $rA, stream b $rB")
    val out = spark.table("gws.db.soak")
      .select("id", "src").as[(Long, String)].collect()
    // exactly-once per app: every epoch's row exactly once, despite
    // kills, conflict-driven restarts, and checkpoint replays
    assert(out.length == out.distinct.length,
      s"duplicate rows after soak: ${out.groupBy(identity)
        .filter(_._2.length > 1).keys.toSeq.sorted.take(10)}")
    val bysrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bysrc.getOrElse("a", Set.empty) == (1000L until 1006L).toSet,
      s"stream a lost or duplicated epochs: ${bysrc.get("a")}")
    assert(bysrc.getOrElse("b", Set.empty) == (2000L until 2006L).toSet,
      s"stream b lost or duplicated epochs: ${bysrc.get("b")}")
    // no lost updates: every DELETE batch landed despite the streams
    assert(bysrc.getOrElse("seed", Set.empty).isEmpty,
      s"DELETE batches lost under concurrent streams: ${bysrc.get("seed")}")
  }

  test("concurrent INSERT and DELETE serialize through the commit arbiter") {
    import spark.implicits._
    wh
    spark.sql("CREATE TABLE gws.db.race AS " +
      "SELECT id, concat('r', id) AS tag FROM range(200)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    def isConflict(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.util.ConcurrentModificationException] ||
        (t.getMessage != null &&
          (t.getMessage.contains("moved from") ||
            t.getMessage.contains("another writer") ||
            t.getMessage.contains("retry"))) ||
        isConflict(t.getCause))
    // generous budget: under full-suite load a staging pass can take
    // seconds, so two writers may conflict many times before landing
    def retrying(sql: String, tries: Int = 40): Unit = {
      var n = 0
      var done = false
      while (!done) {
        try { spark.sql(sql).collect(); done = true }
        catch {
          case e: Throwable if n < tries && isConflict(e) =>
            n += 1; Thread.sleep(math.min(500L, 50L * n))
        }
      }
    }
    val ins = Future(retrying(
      "INSERT INTO gws.db.race SELECT id, concat('r', id) FROM range(200, 300)"))
    val del = Future(retrying(
      "DELETE FROM gws.db.race WHERE id < 50"))
    Await.result(ins, 120.seconds)
    Await.result(del, 120.seconds)
    // both payloads intact: 200 - 50 + 100
    val ids = spark.table("gws.db.race").select("id").as[Long]
      .collect().toSet
    assert(ids.size == 250, s"expected 250 rows, got ${ids.size}")
    assert(!ids.exists(_ < 50) && ids.contains(250L) && ids.contains(150L))
  }
}

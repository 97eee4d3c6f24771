package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase wall-clock INSIDE one keep-best transaction body — laps
  * around decide (sigs / pairs / dec / doomed), the intent write, the
  * LSH replace commit and the BM25 delete+append, mirroring
  * [[Pipeline.kbApplyBatch]] statement for statement (same calls, same
  * order, no lease/watermark since this is a throwaway dir). Guide §1:
  * the loop-level laps said "the batch costs 15 s"; this says which
  * statement.
  */
object KbBatchProf {
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
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kbbatchprof").toString
    val base = Dedup.incrLoopBase(docs)
    val baseText = base.select(col("doc_id"),
      array_join(col("toks"), " ").as("text"))
    Dedup.lshIndexBuild(base, s"$dir/lsh",
      corpusId = Some(s"ephemeral:$dir"))
    Bm25Index.build(baseText, s"$dir/bm25",
      corpusId = Some(s"ephemeral:$dir"))
    val pending = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = e.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name).getOrElse("?")
          starts.put(e.jobId, (site, e.time)): Unit
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId)).foreach { case (site, s0) =>
            pending.add((site, s0, e.time)): Unit
          }
        }
      })
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"SUB $tag%-28s ${(t - t0) / 1e9}%6.2f s")
      t0 = t
      Thread.sleep(150)
      val drained = Iterator.continually(pending.poll())
        .takeWhile(_ != null).toSeq
      drained.groupBy(_._1).map { case (s, js) =>
        (s, js.map(j => (j._3 - j._2) / 1e3).sum, js.size)
      }.toSeq.sortBy(-_._2).take(10).foreach { case (s, d, c) =>
        println(f"      $d%7.3f s x$c%-3d $s")
      }
      t0 = System.nanoTime()
    }
    lap("builds")
    (1 to Dedup.IncrLoopBatches).foreach { b =>
      val batch = Dedup.incrLoopBatch(docs, b)
        .filter(size(col("toks")) >= 3)
      val (dec, doomed, sigs) = Dedup.dedupBatchVsIndexKeepBestDecide(
        batch, s"$dir/lsh", 0.5)
      lap(s"b$b decide (3 ckpts)")
      val keep = dec
        .filter(col("decision").isin("kept", "replaced_corpus"))
        .select("doc_id")
      doomed.withColumnRenamed("corpus_id", "doc_id")
        .select(col("doc_id"), lit("").as("text"), lit("doom").as("role"))
        .unionByName(batch.join(keep, "doc_id")
          .select(col("doc_id"),
            array_join(col("toks"), " ").as("text"),
            lit("keep").as("role")))
        .write.mode("overwrite").parquet(s"$dir/txn/batch=$b")
      lap(s"b$b intent write")
      Dedup.dedupBatchVsIndexKeepBestCommit(dec, doomed, sigs,
        s"$dir/lsh", Some(("prof", b.toLong)))
      lap(s"b$b lsh commit")
      val intent = spark.read.parquet(s"$dir/txn/batch=$b")
      Bm25Index.deleteAndAppend(
        intent.filter(col("role") === "doom").select("doc_id"),
        intent.filter(col("role") === "keep").select("doc_id", "text"),
        s"$dir/bm25", txnApp = Some(("prof", b.toLong))): Unit
      lap(s"b$b bm25 delete+append")
    }
    Bm25Index.topDocs(spark, s"$dir/bm25", 10, 3).count(): Unit
    lap("probe")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Bm25Index, Dedup, Manifest, Pipeline}

/** Phase wall-clock of the EXACT `ns_corpus_bm25_keep_best` body —
  * setup (fresh clones of the build-once masters), the three
  * transactional keep-best batches ([[Pipeline.kbApplyBatch]], the
  * same body the stream drives), and the standing-index probe — so
  * the loop's bench seconds attribute to phases instead of one
  * opaque count() (guide §1). Masters must already exist (run the
  * bench query once first) or the first lap absorbs the build.
  */
object KbPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
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

    // per-phase job attribution: collect (site, dur) of every job that
    // STARTED since the last lap
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
          Option(starts.remove(e.jobId)).foreach { case (site, t0) =>
            pending.add((site, t0, e.time)): Unit
          }
        }
      })

    (1 to reps).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t = System.nanoTime()
        println(f"PHASE rep$rep $tag%-24s ${(t - t0) / 1e9}%6.2f s")
        t0 = t
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val drained = Iterator.continually(pending.poll())
          .takeWhile(_ != null).toSeq
        drained.groupBy(_._1).map { case (s, js) =>
          (s, js.map(j => (j._3 - j._2) / 1e3).sum, js.size)
        }.toSeq.sortBy(-_._2).take(8).foreach { case (s, d, c) =>
          println(f"    $d%7.3f s x$c%-3d $s")
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory("graft-kbphases").toString
      val base = Dedup.incrLoopBase(docs)
      val baseText = base.select(col("doc_id"),
        array_join(col("toks"), " ").as("text"))
      val master = java.nio.file.Files
        .createTempDirectory("graft-kbphases-master").toString
      Dedup.lshIndexBuild(base, s"$master/lsh")
      Bm25Index.build(baseText, s"$master/bm25")
      lap("master build")
      Dedup.lshIndexFresh(base, s"$master/lsh", s"$dir/lsh")
      lap("lsh fresh (fp+clone)")
      Bm25Index.fresh(baseText, s"$master/bm25", s"$dir/bm25")
      lap("bm25 fresh (fp+clone)")
      (1 to Dedup.IncrLoopBatches).foreach { b =>
        Pipeline.kbApplyBatch(Dedup.incrLoopBatch(docs, b), dir,
          b.toLong, 0.5, "graft-kb-bm25-loop")
        lap(s"batch $b kbApplyBatch")
      }
      Bm25Index.topDocs(spark, s"$dir/bm25", 10, 3).count(): Unit
      lap("topDocs probe")
      def rm(p: String): Unit = {
        def go(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(go))
          f.delete(): Unit
        }
        go(new java.io.File(p))
      }
      rm(dir); rm(master)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Attribute a named `SparkEntry.queries` run to its Spark JOBS — one
  * line per job with wall duration and the action's call site, plus a
  * call-site aggregate. The diagnostic companion to [[BenchOne]] for
  * the multi-job ingest loops, where a single `.count()` at the end
  * hides 50+ internal jobs (probe materializations, staged writes,
  * commits): the per-call-site table says which internal pass the
  * seconds actually go to (guide §1: measure first, empirically).
  *
  * Usage: runMain graft.OptProfile <query> [query ...]
  * (sf dir via SPARK_GRAFT_SF_DIR, cpus via SPARK_GRAFT_CPUS).
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: OptProfile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    final case class Job(id: Int, site: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's name IS the action's short call site
        val site = e.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name).getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, site, e.time))
        order.add(e.jobId): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        jobs.forEach { (_, j) => if (j.end == 0L) () }
        // attribute by the active job is fiddly; skip — job rows suffice
        val _ = sid
      }
    }

    for (name <- args) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // warm-up rep builds any build-once masters outside the profile
      fn(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggler job-end events drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = order.asScala.flatMap(id => Option(jobs.get(id))).toSeq
      println(f"== $name rows=$n wall=$wall%.2f s jobs=${rows.size}")
      var prevEnd = 0L
      rows.foreach { j =>
        val dur = (j.end - j.start) / 1e3
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d ${dur}%7.3f s  (gap ${gap}%6.3f)  ${j.site}")
      }
      val agg = rows.groupBy(_.site).map { case (s, js) =>
        (s, js.map(j => (j.end - j.start) / 1e3).sum, js.size)
      }.toSeq.sortBy(-_._2)
      println("  -- by call site --")
      agg.foreach { case (s, t, c) => println(f"  $t%8.3f s  x$c%-3d  $s") }
      val jobTotal = rows.map(j => (j.end - j.start) / 1e3).sum
      println(f"  job-time total $jobTotal%.2f s of $wall%.2f s wall " +
        f"(driver/gaps ${wall - jobTotal}%.2f s)")
    }
    spark.stop()
  }
}

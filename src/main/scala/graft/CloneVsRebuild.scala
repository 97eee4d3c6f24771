package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup

/** Measure the keep-best setup crossover (round-16 verdict #5): a
  * mutation-bearing consumer needs a FRESH index over the base corpus
  * each application — either by re-banding the corpus
  * ([[Dedup.lshIndexBuild]]: one parallel banding pass, cost scales
  * with corpus rows) or by byte-copying a read-only master
  * ([[Dedup.lshIndexClone]]: per-file copy tasks, cost scales with
  * index files + bytes). This main times BOTH paths at a given SF so
  * the auto-select gate ([[Dedup.lshIndexFresh]]) runs on a measured
  * number, not an assertion. Results recorded in PLANS.md.
  *
  * Usage: runMain graft.CloneVsRebuild [sfDir] (reps via
  * SPARK_GRAFT_BENCH_REPS, cpus via SPARK_GRAFT_CPUS).
  */
object CloneVsRebuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
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
    val base = Dedup.incrBase(docs)
    def tmp() = java.nio.file.Files
      .createTempDirectory("graft-cvr").toString
    def rmrf(p: String): Unit = {
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(p))
    }
    // master for the clone path, built once outside any timed window
    val master = tmp()
    Dedup.lshIndexBuild(base, master)
    val (bytes, files) = graft.ops.Manifest
      .read(spark, s"$master/bands")
      .map(es => (es.map(_.bytes).sum, es.size)).getOrElse((0L, 0))

    def time(f: String => Unit): Seq[Double] = (1 to reps).map { _ =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val d = tmp()
      val t0 = System.nanoTime()
      f(d)
      val s = (System.nanoTime() - t0) / 1e9
      rmrf(d)
      s
    }
    val rebuild = time(d => Dedup.lshIndexBuild(base, d))
    val clone = time(d => Dedup.lshIndexClone(spark, master, d))
    rmrf(master)
    def js(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"sf":"$sfDir","index_bytes":$bytes,"index_files":$files,""" +
      s""""rebuild_s":${js(rebuild)},"clone_s":${js(clone)},""" +
      s""""rebuild_min":${rebuild.min},"clone_min":${clone.min}}""")
    spark.stop()
  }
}

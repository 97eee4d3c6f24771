package graft

import org.apache.spark.sql.SparkSession

/** Fixed-cost attribution for the streaming bench floor (round-13
  * verdict #6): `st_hll_users` and `st_available_now` are the slowest
  * sf0.1 queries at 1.2-1.9 s, suspected micro-batch/checkpoint setup
  * rather than data. This main separates the suspects with timed
  * variants over the SAME session and data:
  *
  *   batch_hourly    the identical aggregation as a batch query —
  *                   the pure data cost;
  *   stream_trivial  AvailableNow drain of a 3-row in-session parquet
  *                   with a count(*) — the micro-batch + temp-
  *                   checkpoint + memory-sink floor with ~zero data;
  *   stream_hourly   the bench query verbatim;
  *   stream_shm      same, with the checkpoint root on /dev/shm —
  *                   isolates the disk component of the floor;
  *   hll_trivial     transformWithState drain of the 3-row source
  *                   under RocksDB — the state-store init floor;
  *   hll_full        the st_hll_users bench query verbatim.
  *
  * One JSON line per variant (min/median of reps). The adjudication
  * lives in PLANS.md ("Streaming fixed-cost floor").
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    // a tiny parquet source for the data-free floors
    val tiny = java.nio.file.Files.createTempDirectory("floor_src").toString
    spark.range(3).selectExpr("id", "timestamp'2024-01-01' as ts")
      .coalesce(1).write.mode("overwrite").parquet(tiny)

    def timed(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"variant":"$name","min":${ts.head}%.3f,""" +
        f""""median":${ts(ts.size / 2)}%.3f,"reps":$reps}""")
    }

    def drainTiny(qn: String): Unit = {
      val raw = spark.read.parquet(tiny)
      val q = spark.readStream.schema(raw.schema).parquet(tiny)
        .groupBy().count()
        .writeStream.format("memory").queryName(qn)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    timed("batch_hourly") {
      graft.ops.Events.hourlyTypeCounts(
        graft.ops.T(spark, sfDir, "events")).count()
    }
    timed("stream_trivial") { drainTiny("floor_trivial") }
    timed("stream_hourly") {
      graft.streaming.EventStreams.availableNowHourly(spark, sfDir).count()
    }
    val ckKey = "spark.sql.streaming.checkpointLocation"
    val prevCk = spark.conf.getOption(ckKey)
    val shmOk = new java.io.File("/dev/shm").canWrite
    if (shmOk) {
      // a FRESH root per repetition: a fixed root + named query would
      // resume from committed offsets on rep 2 and measure a no-op
      val made = scala.collection.mutable.ArrayBuffer[String]()
      try timed("stream_shm") {
        val root = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "floor_ck").toString
        made += root
        spark.conf.set(ckKey, root)
        graft.streaming.EventStreams.availableNowHourly(spark, sfDir).count()
      } finally {
        prevCk match {
          case Some(v) => spark.conf.set(ckKey, v)
          case None => spark.conf.unset(ckKey)
        }
        made.foreach(r =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r)))
      }
    }
    timed("hll_trivial") {
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
        "streaming.state.RocksDBStateStoreProvider")
      try drainTiny("floor_hll_trivial")
      finally prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    timed("hll_full") {
      graft.streaming.HllStream.availableNowHllUsers(spark, sfDir).count()
    }
    spark.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming specs: feed the driver events through MemoryStream in
  * multiple micro-batches and check the streaming aggregations agree
  * with their batch forms (no late data at these watermarks, so the
  * results must match exactly).
  */
class StreamingSpec extends SparkSpec {

  private def batchEvents = graft.ops.T(spark, sf, "events")

  private def loadEvents: Seq[EventStreams.Event] = {
    import spark.implicits._
    batchEvents
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .as[EventStreams.Event].collect().toSeq
  }

  private def runToMemory(
      name: String,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val events = loadEvents
    val (first, second) = events.splitAt(events.size / 2)
    val query = build(stream.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      stream.addData(first); query.processAllAvailable()
      stream.addData(second); query.processAllAvailable()
      // a far-future heartbeat advances the watermark so append-mode
      // windows before it finalize and emit
      stream.addData(EventStreams.Event(999999L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "hb", 0.0, "{}"))
      query.processAllAvailable()
    } finally query.stop()
    spark.table(name)
  }

  test("streaming hourly windows equal the batch aggregation") {
    val got = runToMemory("hourly", EventStreams.hourlyTypeCounts, "append")
      .filter(col("event_type") =!= "hb")
      .orderBy("window_start", "event_type")
      .collect()
    val want = graft.ops.Events.hourlyTypeCounts(
        batchEvents.withColumn("ts", col("ts").cast("timestamp")))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming sessions equal the batch session_window") {
    val got = runToMemory("sessions", EventStreams.userSessions, "append")
      .filter(col("n_events") > 0)
      .orderBy("user_id", "session_start")
      .collect()
      .filterNot(r => r.getLong(0) == 0L &&
        r.getAs[java.sql.Timestamp](1).toString.startsWith("2030"))
    val want = graft.ops.Events.userSessions(
        batchEvents.withColumn("ts", col("ts").cast("timestamp")))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("checkpointed query restarts exactly-once: no loss, no dupes") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_ckpt_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val events = batchEvents.withColumn("ts", col("ts").cast("timestamp"))
    events.repartition(6).write.mode("overwrite").parquet(stage)

    def start() = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run a couple of micro-batches, then kill the query mid-stream
    val q1 = start()
    try {
      while (q1.recentProgress.length < 2) Thread.sleep(50)
    } finally q1.stop()
    // restart from the same checkpoint and drain
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out)
    assert(got.count() == events.count(), "row count must survive restart")
    assert(got.select("event_id").distinct().count() == events.count(),
      "no duplicated events after restart")
  }

  test("Trigger.AvailableNow drains the full source then stops on its own") {
    val stage = java.nio.file.Files.createTempDirectory("graft_an_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_an_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_an_ckpt").toString
    val events = batchEvents.withColumn("ts", col("ts").cast("timestamp"))
    events.repartition(4).write.mode("overwrite").parquet(stage)
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-stop")
    assert(spark.read.parquet(out).count() == events.count())
  }

  test("dropDuplicatesWithinWatermark removes a replayed micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val events = loadEvents.take(100)
    val query = EventStreams.dedupWithinWatermark(stream.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      stream.addData(events); query.processAllAvailable()
      stream.addData(events); query.processAllAvailable() // replay
    } finally query.stop()
    assert(spark.table("dedup").count() == 100)
  }

  test("transformWithState running totals equal the batch per-user counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[EventStreams.Event]
      val events = loadEvents.take(2000)
      val (first, second) = events.splitAt(events.size / 2)
      val query = EventStreams.runningUserTotalsTws(spark, stream.toDF())
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      try {
        stream.addData(first); query.processAllAvailable()
        stream.addData(second); query.processAllAvailable()
      } finally query.stop()
      val latest = spark.table("tws")
        .groupBy("user_id").agg(max("n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = events.groupBy(_.user_id).map { case (u, es) => u -> es.size.toLong }
      assert(latest == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val events = loadEvents
    val (first, second) = events.splitAt(events.size / 2)
    val query = EventStreams.purchaseClickJoin(stream.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      stream.addData(first); query.processAllAvailable()
      stream.addData(second); query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("ssjoin")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = batchEvents.withColumn("ts", col("ts").cast("timestamp"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("mapGroupsWithState accumulates per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val events = loadEvents
    val (first, second) = events.splitAt(events.size / 2)
    val query = EventStreams.runningUserTotals(spark, stream.toDF())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      stream.addData(first); query.processAllAvailable()
      stream.addData(second); query.processAllAvailable()
    } finally query.stop()
    // latest state per user must equal the batch per-user counts
    val latest = spark.table("running")
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == want)
  }
}

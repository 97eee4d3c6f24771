package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.ops.T
import graft.streaming.EventStreams

/** Event-time encoding robustness: the driver's testdata has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) (read as long under
  * nanosAsLong) in one generation and as timestamp[us] (read as
  * TIMESTAMP_NTZ) in another. Every reader — batch and streaming —
  * must produce identical results under nanos-long, TIMESTAMP, and
  * TIMESTAMP_NTZ physical encodings. This spec fabricates all three
  * from the same logical rows and pins equality.
  */
class EventTimeSpec extends SparkSpec {

  /** Three parquet dirs holding the same logical (ts, user_id, v) rows
    * under the three physical ts encodings.
    */
  private lazy val dirs: Map[String, String] = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ts_enc").toString
    val rows = Seq( // micros since epoch
      (1700000000000000L, 1L, 1.0), (1700000030000000L, 2L, 2.0),
      (1700003600000000L, 1L, 3.0), (1700007200000000L, 3L, 4.0))
    val micros = rows.toDF("us", "user_id", "value")

    val longDir = s"$base/nanos_long"
    micros.select((col("us") * 1000L).as("ts"), col("user_id"), col("value"))
      .write.parquet(longDir)

    val tsDir = s"$base/timestamp"
    micros.select(timestamp_micros(col("us")).as("ts"), col("user_id"), col("value"))
      .write.parquet(tsDir)

    val ntzDir = s"$base/timestamp_ntz"
    micros.select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("value"))
      .write.parquet(ntzDir)

    Map("nanos_long" -> longDir, "timestamp" -> tsDir, "timestamp_ntz" -> ntzDir)
  }

  private def read(dir: String): DataFrame = spark.read.parquet(dir)

  private def rendered(df: DataFrame): Seq[(String, Long, Double)] = {
    import spark.implicits._
    df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
        col("user_id"), col("value"))
      .as[(String, Long, Double)].collect().toSeq.sorted
  }

  test("raw reads really carry three distinct physical types") {
    val types = dirs.view.mapValues(d => read(d).schema("ts").dataType).toMap
    assert(types("nanos_long") == org.apache.spark.sql.types.LongType)
    assert(types("timestamp") == TimestampType)
    assert(types("timestamp_ntz") == TimestampNTZType)
  }

  test("normalizeEventTime(ntz=true) gives identical values for all encodings") {
    val out = dirs.values.map(d => T.normalizeEventTime(read(d))).toSeq
    out.foreach(df => assert(df.schema("ts").dataType == TimestampNTZType))
    val vals = out.map(rendered)
    assert(vals.distinct.size == 1, s"diverging values: $vals")
  }

  test("normalizeEventTime(ntz=false) gives watermarkable TIMESTAMP, same values") {
    val out = dirs.values.map(d => T.normalizeEventTime(read(d), ntz = false)).toSeq
    out.foreach(df => assert(df.schema("ts").dataType == TimestampType))
    val vals = out.map(rendered)
    assert(vals.distinct.size == 1, s"diverging values: $vals")
  }

  test("streaming watermark path analyzes and agrees under every encoding") {
    val results = dirs.map { case (name, dir) =>
      val schema = read(dir).schema
      val stream = T.normalizeEventTime(
        spark.readStream.schema(schema).parquet(dir), ntz = false)
      val sink = s"enc_sink_$name"
      val q = EventStreams.hourlyTypeCounts(
          stream.withColumn("event_type", concat(lit("u"), col("user_id")))
            .withColumn("props", lit("")))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      name -> spark.table(sink)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"), col("n"), col("mass"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(results.values.toSeq.distinct.size == 1,
      s"streaming results diverge across encodings: $results")
    assert(results.values.head.nonEmpty)
  }

  test("st_available_now runs against the live testdata encoding") {
    val df = EventStreams.availableNowHourly(spark, sf)
    assert(df.count() > 0)
  }
}

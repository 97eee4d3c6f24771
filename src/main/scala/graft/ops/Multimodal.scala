package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: media as opaque `binary` columns with
  * typed metadata, plus a batched decode/feature-extract pipeline.
  *
  * The container has no image/audio codecs, so the decode step is a
  * DETERMINISTIC STUB (documented below); everything around it — the
  * binary column, the metadata struct, the per-partition batched
  * mapPartitions shape, the output schema — is the real plumbing a
  * codec would plug into.
  *
  * Scale posture: media bytes stay in executor space end-to-end (no
  * collect); decode runs per-partition with batch amortization, which
  * is the Scala analogue of `mapInPandas` batches; metadata-only
  * queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** Documents lifted into a multimodal layout: payload bytes + typed
    * metadata + content digest. Oracle-checkable because every derived
    * value is a deterministic function of the payload.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (lit(16) + col("doc_id") % 64).cast("int").as("width"),
        (lit(16) + col("doc_id") % 48).cast("int").as("height"),
        col("source").as("media_source"))

  /** Metadata/digest projection over the media table — the query a
    * catalog scan would run; payload length + sha256 prefix stand in
    * for decoded features.
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        col("width"), col("height"),
        substring(sha2(col("payload"), 256), 1, 8).as("sha_prefix"),
        col("media_source"))
      .orderBy("doc_id")

  /** Frame sampling: fixed-width "frames" cut from the payload at a
    * stride — the multimodal analogue of video frame-sampling, with
    * the same plumbing (per-row fan-out, bounded frame count, payload
    * stays distributed). Stub-level decode: frames are raw slices.
    */
  def frameSample(docs: DataFrame, frameLen: Int = 16, stride: Int = 64): DataFrame =
    docs.filter(length(col("text")) >= frameLen)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L),
            floor((length(col("text")) - frameLen) / stride).cast("long")),
          i => col("text").substr(
            (i * stride + 1).cast("int"), lit(frameLen)))))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        col("col").as("frame"))
      .orderBy("doc_id", "frame_idx")

  /** Resize: subsample the payload to a fixed target width by taking
    * evenly-spaced samples — the stub analogue of image resizing
    * (nearest-neighbor downsample over a 1-D payload), with the real
    * plumbing: deterministic index arithmetic, per-row bounded output,
    * metadata updated to the new dimensions.
    */
  def resize(docs: DataFrame, targetWidth: Int = 32): DataFrame =
    docs.filter(length(col("text")) >= targetWidth)
      .select(col("doc_id"),
        length(col("text")).as("orig_len"),
        lit(targetWidth).as("new_width"),
        concat_ws("",
          transform(sequence(lit(0), lit(targetWidth - 1)),
            i => col("text").substr(
              (i * length(col("text"))).cast("long")
                .divide(targetWidth).cast("int") + 1,
              lit(1)))).as("resized"))
      .orderBy("doc_id")

  def resizeOracle(targetWidth: Int = 32): String =
    s"""SELECT doc_id, length(text)::INT AS orig_len,
       |  $targetWidth AS new_width,
       |  array_to_string(list_transform(range(0, $targetWidth),
       |    i -> substr(text, ((i * length(text)) // $targetWidth + 1)::INT, 1)),
       |    '') AS resized
       |FROM documents WHERE length(text) >= $targetWidth
       |ORDER BY doc_id""".stripMargin

  case class MediaFeature(
      doc_id: Long, n_bytes: Int, feat_mean: Double, feat_dim: Int)

  /** Batched "decode + feature extract" over the binary payloads.
    *
    * STUB: a real implementation would decode image/audio bytes here
    * (e.g. JPEG -> HxWx3) and emit an embedding; the container ships
    * no codecs, so the "feature" is the mean byte value — a
    * deterministic stand-in with the same dataflow: binary in,
    * fixed-width numeric features out, computed per partition in
    * batches with no driver round-trip.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // batch loop: the codec would be initialized once per
        // partition here and fed fixed-size batches.
        rows.grouped(64).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val mean =
              if (bytes.isEmpty) 0.0
              else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
            MediaFeature(id, bytes.length, mean, 1)
          }
        }
      }
  }

  /** Oracle-checkable face of [[decodeFeatures]]: mean byte value of
    * the payload is expressible in SQL, so even the stubbed decode is
    * differential-tested end-to-end.
    */
  def decodeFeaturesQuery(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, docs)
      .toDF()
      .select(col("doc_id"), col("n_bytes"), round(col("feat_mean"), 6).as("feat_mean"))
      .orderBy("doc_id")

  val EmbeddingDim = 64

  case class MediaEmbedding(vec_id: Long, embedding: Array[Double])

  /** The binary -> embedding leg of the multimodal loop: a
    * [[EmbeddingDim]]-dim vector per payload, produced in the same
    * batched per-partition shape as [[decodeFeatures]] (this is where
    * a real image/audio encoder would run; the STUB feature for dim d
    * is the mean of the payload bytes at positions ≡ d mod 64 —
    * deterministic and SQL-expressible, so the whole loop stays
    * oracle-checked). Output matches the `embeddings` table contract
    * (`vec_id`, `embedding`), so it feeds [[Similarity.knnIvf]]
    * et al. unchanged — the payload bytes never leave the executors.
    */
  def mediaEmbeddings(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    mediaTable(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val emb = Array.tabulate(EmbeddingDim) { d =>
              // ascending-position accumulation == the oracle's
              // list_avg fold order (bit-stable double parity)
              var s = 0.0; var n = 0; var p = d
              while (p < bytes.length) { s += (bytes(p) & 0xff); n += 1; p += EmbeddingDim }
              if (n == 0) 0.0 else s / n
            }
            MediaEmbedding(id, emb)
          }
        }
      }
      .toDF()
  }

  /** Blocks of the PREVIOUS [[mediaEmbeddingsCut]] run, rotated out
    * when the next run starts (round-12 advisor: the bench JVM runs
    * 217 queries; an un-rotated decoded-embedding cut per run is
    * eviction pressure for everything after it — the same
    * superseded-block discipline the iterative ops apply per round).
    */
  @volatile private var lastCutIds: Set[Int] = Set.empty

  /** [[mediaEmbeddings]] localCheckpointed ONCE (the ANN consumer
    * reads its input five times; without the cut each read re-runs
    * the byte-level decode), with the prior run's blocks unpersisted
    * first. The unpersist cannot live inside the same run — the
    * returned plan is lazy and still references the cut when the
    * caller materializes it — so the leak is bounded to one cut
    * instead of one per run.
    *
    * The rotated ids are the cut's OWN checkpointed RDD (the
    * `LogicalRDD` the eager localCheckpoint leaves behind), not a
    * before/after keyset diff of `getPersistentRDDs` (round-13
    * advisor): a diff would wrongly claim — and unpersist — any RDD a
    * concurrent thread persists during the window. Note the contract
    * this rotation imposes either way: unpersisting a localCheckpoint
    * destroys its truncated lineage, so holding a PRIOR cut across a
    * newer call and re-executing it is unsupported (all in-repo
    * callers are sequential and single-use).
    */
  def mediaEmbeddingsCut(spark: SparkSession, docs: DataFrame): DataFrame =
    synchronized {
      val sc = spark.sparkContext
      lastCutIds.foreach(id => sc.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
      val cut = mediaEmbeddings(spark, docs).localCheckpoint(true)
      lastCutIds = cut.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.toSet
      cut
    }

  /** DuckDB CTE producing [[mediaEmbeddings]]'s vectors from
    * `documents` (payloads are ASCII, so `ascii(substr(...))` equals
    * the payload byte). Shaped for [[Similarity.knnIvfOracleFrom]].
    */
  val mediaEmbeddingCte: String =
    s"""allv AS (SELECT doc_id AS vec_id,
       |    list_transform(range(0, $EmbeddingDim), d ->
       |      coalesce(list_avg(list_transform(
       |        list_filter(range(1, length(text) + 1),
       |          p -> (p - 1) % $EmbeddingDim = d),
       |        p -> ascii(substr(text, p::INT, 1)))), 0.0)) AS v
       |  FROM documents)""".stripMargin

  /** Write every 50th document's payload as an individual `.bin` file
    * — the on-disk shape a real media corpus arrives in (one object
    * per asset). Executor-side writes (foreachPartition), never the
    * driver — and through the Hadoop FileSystem API, so the target
    * resolves to the SHARED filesystem on a real cluster (java.nio
    * would scatter files across executor-local disks and the _SUCCESS
    * guard would make the partial corpus permanent).
    */
  def writeMediaFiles(docs: DataFrame, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = docs.sparkSession
    val dirPath = new Path(dir)
    val driverFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // clear before staging (round-13 advisor): stale doc_*.bin from a
    // prior/larger corpus would survive a re-stage and silently widen
    // the ingest — the _SUCCESS marker only certifies THIS write set
    if (driverFs.exists(dirPath)) driverFs.delete(dirPath, true)
    driverFs.mkdirs(dirPath)
    // ship the DRIVER's Hadoop conf: a bare new Configuration() on the
    // executor would drop spark.hadoop.* session overrides
    // (credentials, fs.defaultFS) and could resolve a different
    // filesystem than the driver
    val bcConf = spark.sparkContext.broadcast(
      new graft.util.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new Path(dir).getFileSystem(bcConf.value.value)
        rows.foreach { r =>
          val out = fs.create(new Path(s"$dir/doc_${r.getLong(0)}.bin"), true)
          try out.write(r.getString(1).getBytes("UTF-8")) finally out.close()
        }
      }
    driverFs.create(new Path(s"$dir/_SUCCESS"), true).close()
  }

  /** Ingest a directory of binary assets with the built-in
    * `binaryFile` source: id parsed from the file name, size from the
    * source's metadata column, digest from the payload bytes. The
    * oracle recomputes all three from the documents table, so the
    * hash match proves the write -> file -> ingest loop is
    * byte-faithful. At scale this is the pattern that moves a media
    * corpus into the engine: a distributed listing + streamed file
    * reads, no driver involvement per asset.
    */
  def ingestBinaryFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    // pathGlobFilter over the directory rather than a glob in the
    // path: the directory always exists once staged, so analysis
    // never depends on glob expansion (which resolves through the
    // configured FileSystem impl and has proven flaky under Hive's
    // ProxyLocalFileSystem on a cold session)
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

  val ingestOracle: String =
    """SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents WHERE doc_id % 50 = 0
      |ORDER BY doc_id""".stripMargin
}

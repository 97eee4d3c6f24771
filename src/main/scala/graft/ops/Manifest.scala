package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One tracked data file in a [[Manifest]]: path relative to the table
  * root, row/byte counts, and per-column min/max for the stat columns.
  */
case class ColRange(col: String, min: Long, max: Long)
case class ManifestEntry(name: String, rows: Long, bytes: Long,
    stats: Seq[ColRange])

/** A minimal versioned file manifest for the layout-managed tables
  * (Z-ordered copies, compacted trees, copy-on-write deletes).
  *
  * Why: parquet footer stats give per-file min/max too, but READING
  * them is O(#files) footer opens on every query — at 100 TB that is
  * tens of thousands of round trips before the first byte of data.
  * A manifest is the table-format answer (Iceberg/Delta-style, reduced
  * to its essence): ONE small metadata read yields the file list plus
  * per-column ranges, so planning prunes files without touching them,
  * and a delete/compact commit is a metadata swap, not a tree walk.
  *
  * Layout on disk, under `<table>/_manifest/`:
  *   - `v<K>/` — a Spark-written JSONL snapshot of [[ManifestEntry]]s
  *   - `CURRENT` — a one-line pointer file naming the live version
  *
  * Commits write the new snapshot FIRST, then atomically overwrite
  * `CURRENT`; a crash between the two leaves the previous complete
  * version live (readers never observe a partial manifest).
  *
  * Scale posture: building stats is ONE distributed pass
  * (`groupBy(input_file_name())` — map-side combined, no row leaves
  * its executor pre-agg); the collect is O(#files), the same bound as
  * any planner's file listing. Incremental commits (copy-on-write
  * delete) reuse carried files' entries verbatim — metadata-only, the
  * property that makes a 100 TB delete proportional to AFFECTED files.
  */
object Manifest {

  val DirName = "_manifest"

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Normalized filesystem path of `dir` (no scheme), for relativizing
    * `input_file_name()` URIs against the table root.
    */
  private def rootPath(spark: SparkSession, dir: String): String = {
    val fs = fsOf(spark, dir)
    fs.makeQualified(new Path(dir)).toUri.getPath
  }

  private def relName(root: String, fileUri: String): String =
    new Path(fileUri).toUri.getPath.stripPrefix(root).stripPrefix("/")

  private def currentLine(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    val p = new Path(s"$dir/$DirName/CURRENT")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Int] =
    currentLine(spark, dir)
      .map(_.split("\\s+").head.stripPrefix("v").toInt)

  /** The streaming-transaction id carried by the CURRENT pointer (the
    * Delta txn pattern): a committing micro-batch records its batchId
    * IN the same atomic pointer write as the snapshot flip, so a
    * replayed batch after a crash can see it was already applied —
    * there is no window where the data is visible but the txn is not.
    */
  def lastTxn(spark: SparkSession, dir: String): Option[Long] =
    currentLine(spark, dir).flatMap(_.split("\\s+")
      .find(_.startsWith("txn=")).map(_.stripPrefix("txn=").toLong))

  def read(spark: SparkSession, dir: String): Option[Seq[ManifestEntry]] =
    currentVersion(spark, dir).flatMap(v => readVersion(spark, dir, v))

  /** Read a SPECIFIC snapshot — time travel. Any version whose data
    * files have not been [[vacuum]]ed is fully readable: in-place
    * commits only ADD files and swap the pointer, they never delete.
    */
  def readVersion(spark: SparkSession, dir: String,
      version: Int): Option[Seq[ManifestEntry]] = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(new Path(s"$dir/$DirName/v$version"))) None
    else Some(
      spark.read.schema(Encoders.product[ManifestEntry].schema)
        .json(s"$dir/$DirName/v$version")
        .as(Encoders.product[ManifestEntry])
        .collect().toSeq.sortBy(_.name))
  }

  /** Claim exclusive right to commit `version` — first-writer-wins:
    * `fs.create(path, overwrite = false)` succeeds exactly once per
    * token, so of two racing committers that both computed the same
    * next version, one proceeds and the other gets a
    * ConcurrentModificationException to retry from a fresh read (the
    * optimistic-concurrency protocol of every manifest-based format).
    */
  def claimVersion(spark: SparkSession, dir: String, version: Int): Unit = {
    val fs = fsOf(spark, dir)
    val token = new Path(s"$dir/$DirName/commit-v$version")
    fs.mkdirs(token.getParent)
    val ok =
      try { fs.create(token, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!ok) {
      // token taken: a real conflict if the claimer's snapshot landed
      // (or CURRENT already moved past); otherwise the claimer died
      // pre-snapshot and the claim is stale — take it over so a
      // crashed commit stays retryable. Live-writer takeover in that
      // narrow window would need leases; this layer documents the
      // single-maintainer assumption instead.
      val done = fs.exists(new Path(s"$dir/$DirName/v$version/_SUCCESS")) ||
        currentVersion(spark, dir).exists(_ >= version)
      if (done) throw new java.util.ConcurrentModificationException(
        s"version v$version of $dir was already committed by another " +
          "writer — re-read the current version and retry")
    }
  }

  /** Commit `entries` as version `version`: claim token first (unless
    * the caller already claimed), snapshot second, CURRENT pointer
    * last (the crash-safe order — readers only ever see complete
    * snapshots, and racing committers are serialized by the claim).
    */
  def write(spark: SparkSession, dir: String, entries: Seq[ManifestEntry],
      version: Int, txn: Option[Long] = None,
      alreadyClaimed: Boolean = false): Unit = {
    if (!alreadyClaimed) claimVersion(spark, dir, version)
    val ds: Dataset[ManifestEntry] =
      spark.createDataset(entries)(Encoders.product[ManifestEntry])
    ds.coalesce(1).write.mode("overwrite")
      .json(s"$dir/$DirName/v$version")
    val fs = fsOf(spark, dir)
    // a maintenance commit (delete/compact) must not erase the last
    // streaming txn, or a post-crash batch replay would re-append:
    // carry it forward unless this commit sets its own
    val effTxn = txn.orElse(lastTxn(spark, dir))
    val out = fs.create(new Path(s"$dir/$DirName/CURRENT"), true)
    val tag = effTxn.map(t => s" txn=$t").getOrElse("")
    try out.write(s"v$version$tag\n".getBytes("UTF-8")) finally out.close()
  }

  /** Per-file stats in one distributed pass. `onlyNames` restricts the
    * scan to specific relative paths (incremental commits stat ONLY
    * the files they rewrote). Stat columns must be integral-typed —
    * layout pruning ranges are BIGINT end to end.
    */
  def scanStats(spark: SparkSession, dir: String, statCols: Seq[String],
      onlyNames: Option[Seq[String]] = None): Seq[ManifestEntry] = {
    val fs = fsOf(spark, dir)
    val root = rootPath(spark, dir)
    val src = onlyNames match {
      case Some(names) =>
        if (names.isEmpty) return Seq.empty
        spark.read.option("basePath", dir)
          .parquet(names.map(n => s"$dir/$n"): _*)
      case None => spark.read.parquet(dir)
    }
    val aggs = count(lit(1)).as("n") +: statCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"mn_$c"),
      max(col(c).cast("long")).as(s"mx_$c")))
    src.groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        val name = relName(root, r.getString(0))
        val bytes = fs.getFileStatus(new Path(s"$dir/$name")).getLen
        ManifestEntry(name, r.getLong(1), bytes,
          statCols.zipWithIndex.flatMap { case (c, i) =>
            // an all-NULL column in a file has no range: record no
            // stats for it (pruning keeps the file — never wrong,
            // just unpruned), matching parquet's own missing-stats rule
            if (r.isNullAt(2 + 2 * i)) None
            else Some(ColRange(c, r.getLong(2 + 2 * i), r.getLong(3 + 2 * i)))
          })
      }.sortBy(_.name)
  }

  /** Build and commit a fresh manifest (next version, or v1). */
  def create(spark: SparkSession, dir: String,
      statCols: Seq[String]): Seq[ManifestEntry] = {
    val entries = scanStats(spark, dir, statCols)
    write(spark, dir, entries, currentVersion(spark, dir).getOrElse(0) + 1)
    entries
  }

  /** Create-if-absent (idempotent reader-side repair). */
  def ensure(spark: SparkSession, dir: String,
      statCols: Seq[String]): Seq[ManifestEntry] =
    read(spark, dir).getOrElse(create(spark, dir, statCols))

  /** Absolute paths of the files whose stat ranges intersect EVERY
    * requested `(col, lo, hi)` rectangle side; `None` when the table
    * has no manifest (caller falls back to a full-directory read).
    * A file with no recorded stats for a column is kept — pruning may
    * only ever SKIP files it can prove non-matching.
    */
  def prunedPaths(spark: SparkSession, dir: String,
      ranges: Seq[(String, Long, Long)]): Option[Seq[String]] =
    read(spark, dir).map(_.filter { e =>
      ranges.forall { case (c, lo, hi) =>
        e.stats.find(_.col == c).forall(s => s.max >= lo && s.min <= hi)
      }
    }.map(e => s"$dir/${e.name}"))

  /** Deletion-vector directory of a snapshot version: a tiny parquet
    * set of (file basename, row position) pairs marking rows deleted
    * MERGE-ON-READ — the write-cheap delete path (Delta DVs / Iceberg
    * position deletes): marking costs O(matches) metadata, no data
    * file is rewritten, and readers subtract the positions. Basenames
    * suffice as file keys: every writer in this layer names files with
    * UUID part-names (plus unique verb prefixes).
    */
  def dvDir(dir: String, version: Int): String =
    s"$dir/$DirName/dv-v$version"

  def hasDeletionVectors(spark: SparkSession, dir: String): Boolean =
    currentVersion(spark, dir).exists(v =>
      fsOf(spark, dir).exists(new Path(dvDir(dir, v))))

  /** Read the table THROUGH its manifest: the file list comes from the
    * current snapshot (or the `version` snapshot — time travel), not a
    * directory walk, and `basePath` keeps partition-directory columns
    * intact. A snapshot's deletion vector, when present, is subtracted
    * with a broadcast anti-join on (file, row position). Falls back to
    * a plain read when no manifest exists.
    * NOTE: once a table has in-place commits, a plain directory read
    * is WRONG (it would see superseded files) — the manifest is the
    * table, exactly as in any manifest-based format.
    */
  def readTable(spark: SparkSession, dir: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, dir))
    val entries = version match {
      case Some(vv) => readVersion(spark, dir, vv).getOrElse(
        throw new IllegalArgumentException(
          s"no manifest version $vv under $dir"))
      case None => read(spark, dir).getOrElse(Seq.empty)
    }
    if (entries.isEmpty) return spark.read.parquet(dir)
    val base = spark.read.option("basePath", dir)
      .parquet(entries.map(e => s"$dir/${e.name}"): _*)
    val dv = v.map(dvDir(dir, _))
      .filter(p => fsOf(spark, dir).exists(new Path(p)))
    dv match {
      case Some(p) =>
        val marks = spark.read.parquet(p)
        base
          .withColumn("_dv_f", element_at(
            split(col("_metadata.file_path"), "/"), -1))
          .withColumn("_dv_p", col("_metadata.row_index"))
          .join(broadcast(marks), col("_dv_f") === marks("file") &&
            col("_dv_p") === marks("pos"), "left_anti")
          .drop("_dv_f", "_dv_p")
      case None => base
    }
  }

  /** Rows ADDED between two snapshots: the files present in
    * `toVersion` but not in `fromVersion`, read as one DataFrame —
    * incremental consumption of an append-only table (each streaming
    * or batch append lands as new files, so the entry-name diff IS the
    * change set, and a downstream pipeline processes O(delta) per
    * cycle instead of rescanning the table). On tables that also
    * rewrite (delete/compact/upsert), rewritten survivors appear as
    * "added" files — restating rows the consumer has seen — so the
    * incremental contract is append-only windows between maintenance,
    * exactly as with file-listing-based streaming sources.
    */
  def readChanges(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val fromNames = readVersion(spark, dir, fromVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest version $fromVersion under $dir"))
      .map(_.name).toSet
    val added = readVersion(spark, dir, toVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest version $toVersion under $dir"))
      .filterNot(e => fromNames.contains(e.name))
    if (added.isEmpty)
      readTable(spark, dir, Some(toVersion)).filter(lit(false))
    else
      spark.read.option("basePath", dir)
        .parquet(added.map(e => s"$dir/${e.name}"): _*)
  }

  /** Table-root-relative name of a data-file URI (the inverse of the
    * `$dir/$name` path construction used everywhere above).
    */
  def relativize(spark: SparkSession, dir: String, fileUri: String): String =
    relName(rootPath(spark, dir), fileUri)

  /** Delete every data file the CURRENT snapshot does not reference —
    * the storage-reclaim step that retires time travel to superseded
    * versions. Never touches `_manifest` itself (old snapshots remain
    * as metadata history). Returns the number of files removed.
    */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val entries = read(spark, dir).getOrElse(return 0)
    val live = entries.map(_.name).toSet
    val fs = fsOf(spark, dir)
    val root = rootPath(spark, dir)
    val it = fs.listFiles(new Path(dir), true)
    var removed = 0
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val rel = relName(root, f.getPath.toString)
      if (f.getPath.getName.endsWith(".parquet") &&
          !rel.startsWith(DirName + "/") && !live.contains(rel))
        doomed += f.getPath
    }
    doomed.foreach { p => if (fs.delete(p, false)) removed += 1 }
    removed
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (hash-clustered) tables and the shuffle-free co-located
  * join they buy — THE layout decision for repeated big-to-big joins
  * at 100 TB.
  *
  * A `groupBy`/`join` on un-clustered tables shuffles BOTH sides on
  * the key every time it runs: at 100 TB that is the dominant cost of
  * a fact-to-fact join, re-paid per query. Bucketing pays one
  * hash-partitioned write (`bucketBy(n, key).sortBy(key)`) and records
  * the clustering in the catalog; every later equi-join or aggregation
  * on the key reads both sides already co-partitioned — Catalyst plans
  * a SortMergeJoin with ZERO Exchange nodes (BucketedJoinSpec pins
  * this), and with `sortBy` the per-bucket sort is pre-paid too, so
  * the join degenerates to a streaming merge of co-located files.
  *
  * Sizing rule at scale: buckets ≈ table size / target partition size
  * (e.g. 100 TB / 256 MB ≈ 400k — cap by directory-entry budget and
  * use bucket-pruning-friendly key spaces); both sides of a recurring
  * join MUST agree on bucket count and key, which is a data-contract
  * decision, not a per-query one.
  *
  * Reference parity: the reference engine has no persistent clustered
  * layout — every join re-partitions in memory
  * (`frame_tasks/frames.py` merge path); this module is the
  * Spark-native upgrade that makes the Nth join free instead of the
  * first one cheap.
  */
object Bucketing {

  /** Bump when the bucketed-layout semantics change (bucket hash
    * function, file naming, sidecar format): a version mismatch in the
    * sidecar forces a rebuild instead of trusting stale files.
    */
  val LayoutVersion = 1

  /** Write `df` as a bucketed+sorted table registered under `table`
    * with its files at `path` (external, so data survives the
    * session's in-memory catalog). Overwrites any prior layout and
    * records the layout contract in a sidecar descriptor.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, SidecarName),
      descriptor(df, buckets, key).getBytes("UTF-8"))
  }

  private val SidecarName = "_graft_layout"

  /** The layout contract the files at `path` were written under:
    * layout version + bucket count + cluster/sort key + schema + a
    * fingerprint of the SOURCE files (path:length:mtime of every
    * input file of `df`). Reattachment compares the stored descriptor
    * against the one recomputed from the current source, so a changed
    * bucket spec, an evolved schema, or an sf directory regenerated
    * in place under the same layoutDir all force a rebuild — the same
    * invalidation class QuantizerVersion covers for the IVF index.
    * Without this, CREATE TABLE ... CLUSTERED BY over stale files
    * would misdescribe them and the zero-Exchange SortMergeJoin would
    * silently return wrong results.
    */
  private def descriptor(df: DataFrame, buckets: Int, key: String): String = {
    val sig = {
      val md = java.security.MessageDigest.getInstance("MD5")
      // lengths/mtimes through the Hadoop FileSystem API, not
      // java.io.File (round-12 advisor): on hdfs:// or s3a:// a
      // File-based probe returns 0/0 for every file, degrading the
      // signature to path names only — exactly the regenerated-in-
      // place case the sidecar exists to catch. getFileStatus is
      // uniform across local and cluster filesystems.
      val conf = df.sparkSession.sessionState.newHadoopConf()
      df.inputFiles.sorted.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val tag =
          try {
            val st = p.getFileSystem(conf).getFileStatus(p)
            s"$f:${st.getLen}:${st.getModificationTime}"
          } catch { case _: Exception =>
            // a failed probe must never degrade to a STABLE signature:
            // two consecutive failures over different file content
            // would hash identically and reattach a stale layout — the
            // exact wrong-joins case the sidecar exists to prevent
            // (round-13 advisor). A per-probe nonce guarantees the
            // descriptor mismatches and the layout is rebuilt instead.
            s"$f:probe-failed:${java.util.UUID.randomUUID()}"
          }
        md.update((tag + "\n").getBytes("UTF-8"))
      }
      md.digest().map("%02x".format(_)).mkString
    }
    s"""{"layout_version":$LayoutVersion,"buckets":$buckets,"key":"$key",
       |"schema":"${df.schema.toDDL.replace("\"", "'")}",
       |"source_sig":"$sig"}""".stripMargin
  }

  /** Register `table` over an EXISTING bucketed layout at `path`, or
    * build it if absent. The catalog entry is per-session (in-memory
    * metastore), but the layout itself is durable — a fresh session
    * must reattach via CREATE TABLE ... CLUSTERED BY over the same
    * files, not rewrite them (the whole point of paying the clustered
    * write once is that the Nth session's join is free; re-bucketing
    * 100 TB per session would make the layout COST a query instead of
    * an asset — and it made ns_bucketed_join look 20x super-linear in
    * the 10x scale gate, because each bench JVM re-paid the write).
    *
    * Reattach requires the sidecar descriptor to match the contract
    * recomputed from the current request (round-11 advisor): files
    * with a _SUCCESS marker but a different bucket count, key, schema
    * or source fingerprint are REBUILT, not trusted — a misdescribed
    * CLUSTERED BY has no Exchange to save it.
    */
  def ensureBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val sidecar = java.nio.file.Paths.get(path, SidecarName)
      val attachable =
        new java.io.File(s"$path/_SUCCESS").exists() &&
          java.nio.file.Files.exists(sidecar) &&
          new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8") ==
            descriptor(df, buckets, key)
      if (attachable)
        spark.sql(
          s"""CREATE TABLE $table (${df.schema.toDDL})
             |USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$path'""".stripMargin)
      else writeBucketed(df, table, path, buckets, key)
    }
  }

  /** Revenue per order over two bucketed fact tables — the co-located
    * join shape. Both sides are read through their bucket metadata:
    * no Exchange on either input, aggregation reuses the join's
    * clustering (o_orderkey is a superset of the bucket key), so the
    * whole plan runs shuffle-free end to end.
    */
  def revenuePerOrder(spark: SparkSession, ordersTable: String,
      lineitemTable: String): DataFrame = {
    val o = spark.table(ordersTable)
    val l = spark.table(lineitemTable)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .filter(col("o_orderkey") % 100 === 0)
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderkey"))
  }
}

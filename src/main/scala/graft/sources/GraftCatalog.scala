package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.{Layout, Manifest}

/** A Spark `TableCatalog` over manifest-managed tables — the SQL front
  * door to the table format. Registered per session:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/graft_warehouse
  * }}}
  *
  * after which the whole lifecycle is plain SQL, resolved through this
  * catalog to the same layout/manifest verbs the programmatic API
  * uses:
  *
  * {{{
  * CREATE TABLE graft.db.events (user_id BIGINT, kind STRING)
  * INSERT INTO graft.db.events SELECT ...        -- appendInPlace
  * INSERT OVERWRITE graft.db.events SELECT ...   -- overwriteInPlace
  * SELECT * FROM graft.db.events                 -- manifest-planned scan
  * SELECT * FROM graft.db.events VERSION AS OF 2 -- time travel
  * SELECT * FROM graft.db.events TIMESTAMP AS OF '...'
  * ALTER TABLE graft.db.events ADD COLUMN score DOUBLE  -- metadata-only
  * ALTER TABLE graft.db.events DROP COLUMN kind         -- metadata-only
  * DROP TABLE graft.db.events
  * }}}
  *
  * LAYOUT. An identifier `ns1.ns2.t` maps to the directory
  * `<warehouse>/ns1/ns2/t`; a table is any directory with a committed
  * `_manifest/CURRENT`, a namespace is any directory without one. The
  * catalog holds NO state of its own — the manifest on storage is the
  * sole source of truth (concurrent writers from other sessions or
  * engines serialize through its first-writer-wins commit, and
  * `loadTable` always re-reads the current snapshot), which is what
  * makes the catalog safe on a 1000-executor cluster with many
  * concurrent drivers: there is nothing to keep in sync.
  *
  * Time travel maps to snapshot reads: `VERSION AS OF n` pins the
  * manifest version, `TIMESTAMP AS OF t` resolves through the commit
  * history ([[Manifest.versionAt]]). Spark hands the catalog
  * timestamps in MICROseconds since epoch.
  *
  * Scale posture: every catalog operation is O(1) metadata reads
  * (pointer file + one snapshot list) — no directory walks, no
  * per-file round trips; data movement happens only inside the
  * distributed write jobs of the layout verbs.
  *
  * Reference parity: the reference engine exposes its frame store
  * through named handles resolved at query time
  * (`frame_tasks/frames.py` registry); this catalog is the Spark-
  * native form — names resolve through Spark's CatalogManager into
  * DSv2 tables, and every SQL surface (SELECT/INSERT/ALTER/SHOW)
  * works unmodified.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
      .stripSuffix("/")
  }

  override def name(): String = catName

  private def spark = SparkSession.active
  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")
  private def dirOf(ns: Seq[String]): String =
    (warehouse +: ns).mkString("/")

  private def isTable(dir: String): Boolean =
    fs.exists(new Path(s"$dir/${Manifest.DirName}/CURRENT"))

  // ---- tables ----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = new Path(dirOf(namespace.toSeq))
    if (!fs.exists(nsDir)) throw new NoSuchNamespaceException(
      (catName +: namespace.toSeq).toArray)
    fs.listStatus(nsDir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(s"${dirOf(namespace.toSeq)}/$n"))
      .sorted
      .map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(dirOf(ident))

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, None, None)

  /** SQL `VERSION AS OF` — Spark passes the version literal verbatim. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.stripPrefix("v").toInt), None)

  /** SQL `TIMESTAMP AS OF` — micros since epoch, per the DSv2 contract. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadAt(ident, None, Some(timestampMicros / 1000L))

  private def loadAt(ident: Identifier, versionAsOf: Option[Int],
      tsMillisAsOf: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = versionAsOf.orElse(tsMillisAsOf.map(ts =>
      Manifest.versionAt(spark, dir, ts).getOrElse(
        throw new IllegalArgumentException(
          s"$dir has no version committed at or before $ts ms"))))
    v.foreach(vv => require(
      Manifest.readVersion(spark, dir, vv).isDefined,
      s"no manifest version $vv under $dir"))
    val schema = v.flatMap(Manifest.tableSchema(spark, dir, _))
      .getOrElse(ManifestSource.tableSchema(spark, dir))
    new ManifestSource.MfTable(dir, schema, None, changeFeed = false,
      startingVersion = None, versionAsOf = v, timestampAsOf = None)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (col, ...): identity transforms only (time-bucket
    // transforms belong in a derived column); the partition columns
    // are recorded as field METADATA in the versioned schema, so the
    // first INSERT already writes Hive-partitioned directories and
    // the scan prunes on partition equality from entry paths alone
    val partCols = partitions.map { t =>
      require(t.name == "identity",
        s"graft catalog supports only identity PARTITIONED BY, got $t")
      val refs = t.references
      require(refs.length == 1 && refs(0).fieldNames.length == 1,
        s"unsupported partition reference in $t")
      refs(0).fieldNames.head
    }.toSeq
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c is not in the table schema"))
    val dir = dirOf(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(new Path(dir))
    val marked = StructType(schema.fields.map { f =>
      if (partCols.contains(f.name))
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putBoolean(Layout.PartitionMetaKey, true).build())
      else f
    })
    // v1 is an EMPTY snapshot carrying only the schema: readable as an
    // empty table at once, and the first INSERT aligns against it
    Manifest.write(spark, dir, Seq.empty, 1, schema = Some(marked))
    loadTable(ident)
  }

  /** `ALTER TABLE ADD/DROP COLUMN` as metadata-only manifest commits
    * ([[Layout.addColumn]] / [[Layout.dropColumn]]); anything else is
    * unsupported.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "nested ADD COLUMN is not supported")
        Layout.addColumn(spark, dir,
          StructField(add.fieldNames.head, add.dataType))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "nested DROP COLUMN is not supported")
        Layout.dropColumn(spark, dir, del.fieldNames.head)
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          "nested RENAME COLUMN is not supported")
        Layout.renameColumn(spark, dir, ren.fieldNames.head, ren.newName)
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames.length == 1,
          "nested ALTER COLUMN TYPE is not supported")
        Layout.widenColumn(spark, dir, upd.fieldNames.head,
          upd.newDataType)
      case other => throw new UnsupportedOperationException(
        s"graft catalog cannot apply $other — supported: ADD COLUMN, " +
          "DROP COLUMN, RENAME COLUMN, ALTER COLUMN TYPE")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    isTable(dir) && fs.delete(new Path(dir), true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    val to = dirOf(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(new Path(to).getParent)
    require(fs.rename(new Path(from), new Path(to)),
      s"rename $from -> $to failed")
  }

  // ---- namespaces ------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => isTable(s"$warehouse/$n"))
      .sorted.map(Array(_))
  }

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val nsDir = new Path(dirOf(namespace.toSeq))
    if (!fs.exists(nsDir)) throw new NoSuchNamespaceException(
      (catName +: namespace.toSeq).toArray)
    fs.listStatus(nsDir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => isTable(s"${dirOf(namespace.toSeq)}/$n"))
      .sorted.map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(new Path(dirOf(namespace.toSeq))) &&
        !isTable(dirOf(namespace.toSeq)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      (catName +: namespace.toSeq).toArray)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val dir = dirOf(namespace.toSeq)
    if (fs.exists(new Path(dir))) throw new NamespaceAlreadyExistsException(
      (catName +: namespace.toSeq).toArray)
    fs.mkdirs(new Path(dir))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = dirOf(namespace.toSeq)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade && fs.listStatus(new Path(dir)).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty — " +
            "use DROP NAMESPACE ... CASCADE")
      fs.delete(new Path(dir), true)
    }
  }
}

package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.ops.{Layout, Manifest}

/** MAINTENANCE SQL for manifest tables — the Delta-style statements a
  * table format owes its operators, parsed ahead of Spark's grammar
  * and executed as driver commands over the layout verbs:
  *
  * {{{
  * OPTIMIZE gsql.db.t                      -- bin-packed compaction
  * OPTIMIZE gsql.db.t ZORDER BY (a, b)     -- + multi-column clustering
  * VACUUM gsql.db.t                        -- reclaim, keep 2 versions
  * VACUUM gsql.db.t RETAIN 5 VERSIONS
  * DESCRIBE HISTORY gsql.db.t              -- the commit log as rows
  * DESCRIBE DETAIL gsql.db.t               -- table facts, one row
  * CLONE gsql.db.t TO gsql.db.t2           -- byte-copy snapshot clone
  * }}}
  *
  * Two ways in, same statements:
  *  - session-wide via `spark.sql.extensions=graft.functions.
  *    GraftExtensions` (the [[GraftSqlParser]] chains in front of the
  *    session's parser and passes everything else through untouched);
  *  - per-call via [[GraftSql.exec]], which needs no session
  *    configuration at all — the form the driver-contract queries use.
  *
  * None of these statements exist in Spark's own grammar, so the
  * interception can never shadow engine syntax; any parse doubt falls
  * through to the delegate.
  *
  * Scale: each command is METADATA-planned on the driver (snapshot
  * reads, O(#files) names) with all row movement in distributed jobs
  * inside the layout verbs — OPTIMIZE rewrites only under-sized or
  * DV-marked groups (bin-packing), VACUUM deletes only files outside
  * the retention window, DESCRIBE HISTORY never opens a data file.
  */
object GraftSql {

  /** Table reference `catalog.ns….table` → the table's directory,
    * resolved through the catalog's own warehouse conf. Requires the
    * catalog to be a [[GraftCatalog]] — these commands rewrite table
    * storage and must never run against a foreign catalog's paths.
    */
  private[sources] def resolveDir(spark: SparkSession,
      parts: Seq[String]): String = {
    require(parts.length >= 2,
      s"qualify the table as <catalog>.<namespace…>.<table>, got " +
        parts.mkString("."))
    val cat = parts.head
    val cls = spark.conf.getOption(s"spark.sql.catalog.$cat").getOrElse(
      throw new IllegalArgumentException(
        s"'$cat' is not a registered catalog"))
    require(cls == classOf[GraftCatalog].getName,
      s"catalog '$cat' is $cls, not a graft catalog")
    val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"catalog '$cat' declares no warehouse"))
    (wh +: parts.tail).mkString("/")
  }

  /** Run one SQL statement with the graft maintenance grammar in
    * front, on ANY session (no extensions conf needed): maintenance
    * statements execute eagerly and return their result rows;
    * everything else is exactly `spark.sql`.
    */
  def exec(spark: SparkSession, sqlText: String): DataFrame =
    GraftSqlParser.intercept(sqlText) match {
      case Some(cmd) =>
        val schema = StructType(cmd.output.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        spark.createDataFrame(cmd.run(spark).asJava, schema)
      case None => spark.sql(sqlText)
    }
}

/** `OPTIMIZE <table> [ZORDER BY (c1, c2, …)]` —
  * [[Layout.compactInPlace]]: bin-packed small-file compaction,
  * optionally Z-order clustered, deletion vectors folded in.
  */
case class OptimizeGraftTable(table: Seq[String], zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSql.resolveDir(spark, table)
    val (before, after) =
      Layout.compactInPlace(spark, dir, zorderBy = zorderBy)
    Seq(Row(before, after))
  }
}

/** `VACUUM <table> [RETAIN <n> VERSIONS]` — [[Manifest.vacuum]]:
  * delete data files outside the retention window (default keeps the
  * current and one superseded version readable).
  */
case class VacuumGraftTable(table: Seq[String], keepVersions: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_removed", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSql.resolveDir(spark, table)
    Seq(Row(Manifest.vacuum(spark, dir, keepVersions)))
  }
}

/** `DESCRIBE HISTORY <table>` — [[Manifest.history]]: the commit log,
  * newest first, one metadata read per version.
  */
case class DescribeGraftHistory(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSql.resolveDir(spark, table)
    Manifest.history(spark, dir).reverse.map(c =>
      Row(c.version, new java.sql.Timestamp(c.timestampMs), c.operation,
        c.nFiles, c.rows, c.bytes))
  }
}

/** `DESCRIBE DETAIL <table>` — one row of table-level facts, all from
  * snapshot metadata (no data file opens): location, current version,
  * file/row/byte totals, partition columns, live-deletion-vector
  * presence.
  */
case class DescribeGraftDetail(table: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("num_files", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType,
      nullable = false)(),
    AttributeReference("has_deletion_vectors", BooleanType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSql.resolveDir(spark, table)
    val v = Manifest.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir has no manifest"))
    val entries = Manifest.readVersion(spark, dir, v).getOrElse(Seq.empty)
    val partCols = entries.headOption.toSeq.flatMap(
      _.name.split('/').dropRight(1).filter(_.contains("="))
        .map(_.split("=")(0)).toSeq)
    Seq(Row(dir, v, entries.size, entries.map(_.bytes).sum,
      entries.map(_.rows).sum, partCols.mkString(","),
      Manifest.hasDeletionVectors(spark, dir)))
  }
}

/** `CLONE <src> TO <dst>` — [[Layout.cloneTable]]: an independent
  * byte-for-byte copy of the source's current snapshot (layout,
  * stats, blooms, deletion vectors all carry), committed as the
  * destination's v1.
  */
case class CloneGraftTable(src: Seq[String], dst: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files", IntegerType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (files, bytes) = Layout.cloneTable(spark,
      GraftSql.resolveDir(spark, src), GraftSql.resolveDir(spark, dst))
    Seq(Row(files, bytes))
  }
}

/** The delegating parser [[graft.functions.GraftExtensions]] injects:
  * three anchored regex productions ahead of the Spark grammar,
  * everything else verbatim to `delegate`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.intercept(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.`]+)\s*(?:ZORDER\s+BY\s*\(([^)]+)\)\s*)?;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`]+)\s*(?:RETAIN\s+(\d+)\s+VERSIONS\s*)?;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CLONE\s+([\w.`]+)\s+TO\s+([\w.`]+)\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r

  private def parts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))

  /** The maintenance command a statement denotes, if any. */
  def intercept(sqlText: String): Option[LeafRunnableCommand] =
    sqlText match {
      case Optimize(tbl, zcols) => Some(OptimizeGraftTable(parts(tbl),
        Option(zcols).toSeq.flatMap(_.split(',').toSeq
          .map(c => c.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty))))
      case Vacuum(tbl, keep) => Some(VacuumGraftTable(parts(tbl),
        Option(keep).map(_.toInt).getOrElse(2)))
      case History(tbl) => Some(DescribeGraftHistory(parts(tbl)))
      case Clone(src, dst) =>
        Some(CloneGraftTable(parts(src), parts(dst)))
      case Detail(tbl) => Some(DescribeGraftDetail(parts(tbl)))
      case _ => None
    }
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-corpus source — the Spark-native extension
  * surface for sources (the ladder the operator side climbs with
  * Expression/Rule): a deterministic, file-less document generator
  * for scale tests.
  *
  * {{{
  * spark.read.format("graft.sources.SynthDocsSource")
  *   .option("rows", "1000000").option("partitions", "64")
  *   .option("tokens", "60").load()
  * }}}
  *
  * Row `i` is (doc_id = i, text = `tokens` md5-derived words), so any
  * two reads — on any cluster, at any parallelism — produce identical
  * data; partitioning splits the id range evenly across `partitions`
  * input partitions, so generation is embarrassingly parallel and no
  * driver-side data exists at all. (This replaces the crossJoin
  * corpus-multiplication trick where a test wants distinct docs.)
  */
class SynthDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsSource.SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("tokens", "40").toInt)
}

object SynthDocsSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Deterministic text for doc `id`: `n` words, each the first 8 hex
    * chars of md5(id_i) — unique vocabulary per doc, so synthetic
    * corpora have no accidental near-dups.
    */
  def text(id: Long, n: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      md.reset()
      md.digest(s"${id}_$i".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
    }.mkString(" ")
  }

  private[sources] class SynthTable(rows: Long, parts: Int, tokens: Int)
      extends Table with SupportsRead {
    override def name(): String = s"synth_docs($rows)"
    override def schema(): StructType = SynthDocsSource.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = SynthDocsSource.schema
          override def toBatch: Batch = new Batch {
            override def planInputPartitions(): Array[InputPartition] =
              (0 until parts).map { p =>
                SynthPartition(rows * p / parts, rows * (p + 1) / parts,
                  tokens): InputPartition
              }.toArray
            override def createReaderFactory(): PartitionReaderFactory =
              new SynthReaderFactory
          }
        }
      }
  }

  private[sources] case class SynthPartition(start: Long, end: Long,
      tokens: Int) extends InputPartition

  private[sources] class SynthReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[SynthPartition]
      new PartitionReader[InternalRow] {
        private var cur = sp.start - 1
        override def next(): Boolean = { cur += 1; cur < sp.end }
        override def get(): InternalRow =
          InternalRow(cur, UTF8String.fromString(text(cur, sp.tokens)))
        override def close(): Unit = ()
      }
    }
  }
}

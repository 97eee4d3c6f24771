package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import graft.SparkSpec

/** Pins the parquet-native bloom filters [[Layout.bloomOptions]]
  * enables: the footer carries a bloom for the requested column, a
  * present key probes positive, and a probe over many absent keys
  * stays near the 1% design fpp — the row-group point-lookup index
  * that composes with manifest file pruning.
  */
class BloomFilterSpec extends SparkSpec {

  test("bloom options write footer blooms that answer membership") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val df = spark.range(0, 20000)
      .selectExpr("id * 2 AS doc_id", "concat('u', id) AS url")
    val w = df.coalesce(2).write.mode("overwrite")
    Layout.bloomOptions(Seq("doc_id", "url"), ndv = 20000)
      .foldLeft(w) { case (ww, (k, v)) => ww.option(k, v) }
      .parquet(dir)

    // part-00000 (ids 0..9999) specifically: listFiles order is
    // filesystem-arbitrary, and part-00001 holds none of the probed
    // keys — .head here is how this test once flaked
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HPath(file.getPath),
      spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      val byCol = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      val bloomReader = reader.getBloomFilterDataReader(block)

      // LONG column: every even id in range is present; odd ids are
      // absent and must mostly probe negative
      val docBloom: BloomFilter =
        bloomReader.readBloomFilter(byCol("doc_id"))
      assert(docBloom != null, "doc_id bloom missing from footer")
      val presentHits = (0 until 1000).count { i =>
        docBloom.findHash(docBloom.hash(i.toLong * 2))
      }
      assert(presentHits == 1000, s"present keys must all hit: $presentHits")
      val absentHits = (0 until 1000).count { i =>
        docBloom.findHash(docBloom.hash(i.toLong * 2 + 1))
      }
      assert(absentHits < 50,
        s"absent-key fp rate ${absentHits / 10.0}% >> 1% design point")

      // STRING column probes via Binary hashes
      val urlBloom: BloomFilter =
        bloomReader.readBloomFilter(byCol("url"))
      assert(urlBloom != null, "url bloom missing from footer")
      assert(urlBloom.findHash(urlBloom.hash(
        Binary.fromString("u77"))))
      val absentStr = (0 until 1000).count { i =>
        urlBloom.findHash(urlBloom.hash(Binary.fromString(s"nope$i")))
      }
      assert(absentStr < 50, s"string fp rate ${absentStr / 10.0}%")
    } finally reader.close()

    // and a layout written WITHOUT the options carries no bloom
    val plainDir = Files.createTempDirectory("graft-nobloom").toString
    df.coalesce(1).write.mode("overwrite").parquet(plainDir)
    val pf = new java.io.File(plainDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val r2 = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HPath(pf.getPath), spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val block = r2.getFooter.getBlocks.get(0)
      val c = block.getColumns.asScala
        .find(_.getPath.toDotString == "doc_id").get
      assert(r2.getBloomFilterDataReader(block).readBloomFilter(c) == null)
    } finally r2.close()
  }
}

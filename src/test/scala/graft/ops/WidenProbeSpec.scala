package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Probe: can the vectorized parquet reader upcast a file's physical
  * INT32/FLOAT under a wider requested read schema? (Spark 4 type
  * widening — the capability INT→BIGINT metadata-only evolution
  * rests on.)
  */
class WidenProbeSpec extends SparkSpec {
  test("INT32 file reads under a BIGINT schema; FLOAT under DOUBLE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    Seq((1, 1.5f, 10), (2, 2.5f, 20)).toDF("i", "f", "k")
      .write.mode("overwrite").parquet(dir)
    val widened = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("k", IntegerType)))
    val out = spark.read.schema(widened).parquet(dir)
      .orderBy("i").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
  }
}

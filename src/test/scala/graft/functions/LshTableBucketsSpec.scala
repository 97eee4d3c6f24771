package graft.functions

import graft.SparkSpec
import graft.ops.{Similarity, T}
import org.apache.spark.sql.functions._

/** [[LshTableBuckets]] replaces the Column-composed per-table bucket
  * array (tables x planes literal-dot `when` chains), which fell out
  * of compiled execution once the ladder put 52 literal arrays in one
  * generated method. The swap is only sound if it is BIT-identical —
  * the dedup `max` and the oracle parity both ride on every collision
  * being reproduced exactly — so this spec derives the plane matrix
  * the same way [[graft.ops.Similarity.knnLshTables]] does and demands
  * equal buckets from both formulations over the real embeddings
  * fixture, in compiled and interpreted execution.
  */
class LshTableBucketsSpec extends SparkSpec {

  private val tables = 4
  private val planes = 6

  private def planeComponent(p: Int, d: Int, salt: String): Double = {
    val h60 = Md5Prefix60.fromBytes(s"${salt}p_${p}_$d".getBytes("UTF-8"))
    ((h60 % 1073741824L) * 2 - 1073741824L).toDouble / 1073741824.0
  }

  private def check(): Unit = {
    val all = T(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val matrix: Array[Array[Array[Double]]] =
      Array.tabulate(tables, planes, 64)((t, p, d) =>
        planeComponent(p, d + 1, s"t${t}_"))
    val viaExpr = all.select(col("vec_id"),
      VectorFunctions.lsh_table_buckets(col("v"), matrix).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaColumns = all.select(col("vec_id") +: (0 until tables).map(t =>
        Similarity.lshBucket(col("v"), planes, s"t${t}_").as(s"b$t")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to tables).map(r.getLong).toVector).toMap
    assert(viaExpr.size == viaColumns.size && viaExpr.nonEmpty)
    viaExpr.foreach { case (id, bs) =>
      assert(bs == viaColumns(id), s"vec $id: $bs vs ${viaColumns(id)}")
    }
  }

  test("expression buckets equal the composed lshBucket columns (compiled)") {
    check()
  }

  test("and under interpreted eval (NO_CODEGEN factory mode)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check()
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}

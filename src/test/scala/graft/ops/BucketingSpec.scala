package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing: the co-located-join story (SURVEY.md §7 scale posture).
  * Writing both join sides bucketed on the key lets the join run with
  * NO shuffle exchange — the physical plan must contain a
  * SortMergeJoin with zero Exchange operators above the scans. This
  * is the technique that turns a repeated 100 TB fact-fact join from
  * a full-network shuffle into a local merge.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is static config — uses ./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    T(spark, sf, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    T(spark, sf, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b").hint("merge"), Seq("l_orderkey"))
    val physical = joined.queryExecution.executedPlan.toString

    assert(physical.contains("SortMergeJoin"),
      s"expected SortMergeJoin:\n$physical")
    assert(!physical.contains("Exchange"),
      s"bucketed join must not shuffle:\n$physical")

    // and it is still correct
    val expected = T(spark, sf, "lineitem")
      .join(T(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}

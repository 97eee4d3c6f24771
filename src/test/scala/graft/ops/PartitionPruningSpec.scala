package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition pruning: a year-partitioned copy of orders queried for
  * one year must scan only that partition (the scan's
  * PartitionFilters carry the predicate, and only matching
  * directories are listed). At 100 TB this is the difference between
  * reading one day and reading the lake.
  */
class PartitionPruningSpec extends SparkSpec {

  test("a year predicate prunes to one partition directory") {
    val dir = Files.createTempDirectory("graft_part").toString
    val orders = T(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val years = orders.select("o_year").distinct().count()
    assert(years > 1, "fixture needs multiple year partitions")

    val one = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1995"),
      plan.take(2000))

    // row-level proof: matches the unpartitioned filter exactly
    val expected = orders.filter(col("o_year") === 1995).count()
    assert(one.count() == expected)
  }
}

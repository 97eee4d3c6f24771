package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Co-located joins via bucketed tables — the 100 TB posture for a
  * fact table joined on the same key query after query.
  *
  * A shuffle join pays O(|fact|) network EVERY time; bucketing pays
  * it ONCE at write (`bucketBy(n, key)`), after which any
  * equi-join/aggregation on the bucket key is exchange-free: Spark
  * trusts the on-disk hash layout (`HashPartitioning(key, n)`) and
  * plans SortMergeJoin with zero ShuffleExchange on the bucketed
  * sides. This spec writes orders + lineitem bucketed by order key
  * and pins exactly that plan shape — a regression (mismatched
  * bucket counts, a config flip, a Spark upgrade dropping the
  * layout trust) re-introduces two fact-sized exchanges and fails
  * here, not in production.
  */
class BucketJoinSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan

  private def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("bucketed fact-fact join runs with zero exchanges") {
    // external bucketed tables under a temp dir (warehouse.dir is a
    // static conf — can't be pointed elsewhere on the shared session)
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh")
    // AQE rewrites SMJ to broadcast at this fixture size, hiding the
    // exchange question the spec exists to answer; production fact
    // sizes are over every broadcast threshold.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b")
        .saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))

      val p = plan(joined)
      assert(p.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected SortMergeJoin, got:\n$p")
      // the join itself must be exchange-free; the only shuffle allowed
      // in the whole plan is the final small groupBy on the dim column
      val joinNode = p.collect { case j: SortMergeJoinExec => j }.head
      assert(countShuffles(joinNode) == 0,
        s"bucketed join sides must not re-shuffle:\n$joinNode")

      // same join over the raw parquet MUST shuffle both sides — the
      // contrast that proves the bucket layout (not fixture size) is
      // what removed the exchanges
      val unbucketed = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val up = plan(unbucketed)
      val uj = up.collect { case j: SortMergeJoinExec => j }.head
      assert(countShuffles(uj) == 2,
        s"unbucketed baseline should shuffle both sides:\n$uj")

      // and the results agree (bucketing is a layout, not a semantic)
      val a = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val b = unbucketed.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(a == b, "bucketed and unbucketed results must match")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

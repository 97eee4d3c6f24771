package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Pins the POINT of bucketing: the co-located join plans with zero
  * Exchange nodes, while the same join over plain parquet shuffles
  * both sides.
  */
class BucketedJoinSpec extends SparkSpec {

  private lazy val ready: Unit = {
    val base = Files.createTempDirectory("graft-bucket-spec").toString
    Bucketing.writeBucketed(spark.read.parquet(s"$sf/orders.parquet"),
      "spec_orders_b", s"$base/orders", 4, "o_orderkey")
    Bucketing.writeBucketed(spark.read.parquet(s"$sf/lineitem.parquet"),
      "spec_lineitem_b", s"$base/lineitem", 4, "l_orderkey")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("bucketed join and keyed agg plan with zero Exchange") {
    ready
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // join + keyed aggregate carry the bucket clustering: no hash
      // repartitioning anywhere (the single rangepartitioning Exchange
      // is the query's own global ORDER BY — presentation, not data
      // movement for the join)
      val plan = finalPlan(Bucketing.revenuePerOrder(spark,
        "spec_orders_b", "spec_lineitem_b"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected a shuffle-free co-located join+agg, got:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      // the SAME join over un-bucketed reads shuffles both sides
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val plain = finalPlan(
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(o("o_orderkey")).count())
      assert(plain.contains("Exchange hashpartitioning"), plain)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("a fresh session REATTACHES the layout instead of rewriting it") {
    ready
    // simulate a new session: the catalog entry is gone but the files
    // survive — ensureBucketed must CREATE ... CLUSTERED BY over the
    // existing path (no rewrite) and the rebound table must keep the
    // zero-Exchange co-located plan
    val path = spark.sql("DESCRIBE TABLE EXTENDED spec_orders_b")
      .filter("col_name = 'Location'").head().getString(1)
      .stripPrefix("file:")
    val before = Files.walk(java.nio.file.Paths.get(path)).toArray.length
    spark.sql("DROP TABLE spec_orders_b")
    Bucketing.ensureBucketed(spark.read.parquet(s"$sf/orders.parquet"),
      "spec_orders_b", path, 4, "o_orderkey")
    val after = Files.walk(java.nio.file.Paths.get(path)).toArray.length
    assert(before == after, "reattach must not rewrite the layout files")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(Bucketing.revenuePerOrder(spark,
        "spec_orders_b", "spec_lineitem_b"))
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed and plain joins agree on results") {
    ready
    val bucketed = Bucketing.revenuePerOrder(spark,
      "spec_orders_b", "spec_lineitem_b").collect()
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    import org.apache.spark.sql.functions._
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .filter(col("o_orderkey") % 100 === 0)
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderkey")).collect()
    assert(bucketed.toSeq == plain.toSeq)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join injection — the Spark 4 optimization the
  * engine leans on when a shuffle join has one selectively-filtered
  * side: the optimizer builds a bloom filter from the filtered
  * (creation) side and pushes a `might_contain` probe below the other
  * side's shuffle, so most non-matching fact rows are dropped BEFORE
  * they are exchanged. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling only the ~matching
  * fraction whenever the dimension filter is selective but the
  * dimension is too big to broadcast.
  *
  * The spec pins both the injection conditions and the semantics so a
  * conf regression (or a Spark upgrade changing defaults) surfaces in
  * CI rather than as a silent 10x shuffle blow-up.
  */
class BloomJoinSpec extends SparkSpec {

  test("a selective dimension filter injects a runtime bloom probe on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // force the shuffle-join regime the bloom filter exists for:
      // broadcast would subsume it (and is what small dims should do)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // production default is 10GB (don't bother below that); the
      // fixture is KB-sized, so lower the floor to exercise the path
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))

      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom probe injected:\n${p.take(3000)}")

      // semantics unchanged: same result as the broadcast plan
      val rows = joined.orderBy("l_linestatus").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val expected = li
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy("l_linestatus").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(rows.sameElements(expected),
        s"bloom-filtered join changed results: ${rows.toSeq} vs ${expected.toSeq}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

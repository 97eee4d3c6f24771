package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew handling: with thresholds lowered to test scale, a join
  * whose left side is dominated by one key must come back from
  * adaptive execution with the skewed partition split
  * (`SortMergeJoin ... skew=true`). This is the runtime complement to
  * explicit salting (Advanced.saltedRevenueByNation): moderate skew
  * is AQE's job, pathological skew is salting's.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a dominated join key") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val big = spark.range(300000)
        .select(when($"id" < 290000, 0L).otherwise($"id").as("k"), $"id".as("payload"))
      val small = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = big.join(small, "k")
      // k=0 matches once each (290k rows); k >= 290000 misses small entirely
      // collect() drives this DataFrame's own QueryExecution, which is
      // the one whose adaptive plan we inspect (foreach/rdd would not)
      assert(joined.collect().length == 290000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

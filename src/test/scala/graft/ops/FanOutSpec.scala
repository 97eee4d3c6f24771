package graft.ops

import graft.SparkSpec

/** The fanOut kernel-spreading repartition is gated by an
  * optimizer-stats SIZE floor, not a partition count: fixture- and
  * small-sf inputs must keep their plans untouched (this is what the
  * ns_knn_pq_rerank plan golden pins at Exchange:3), while a corpus
  * past the floor that planned to fewer partitions than the
  * parallelism must spread across every core before the O(C·d)
  * per-row kernels.
  */
class FanOutSpec extends SparkSpec {

  test("below the floor fanOut is identity, above it spreads to all cores") {
    val par = spark.sparkContext.defaultParallelism

    // ~800 KB of stats (range rows are 8 bytes), one partition:
    // under the 8 MiB floor, the plan must come back untouched
    val small = spark.range(0, 100000, 1, 1).toDF("id")
    assert(small.queryExecution.optimizedPlan.stats.sizeInBytes <
      Similarity.FanOutFloorBytes, "fixture must sit under the floor")
    assert(Similarity.fanOut(small) eq small,
      "sub-floor input must not be repartitioned")

    // ~16 MiB of stats in one partition: over the floor and narrower
    // than the parallelism, so fanOut must repartition to par
    val big = spark.range(0, 2000000, 1, 1).toDF("id")
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes >=
      Similarity.FanOutFloorBytes, "fixture must clear the floor")
    val spread = Similarity.fanOut(big)
    assert(spread.rdd.getNumPartitions == par,
      s"over-floor input must spread to $par partitions, " +
        s"got ${spread.rdd.getNumPartitions}")

    // over the floor but already at least as wide as the parallelism:
    // nothing to spread, identity again (the at-scale no-op claim)
    val wide = spark.range(0, 2000000, 1, par).toDF("id")
    assert(Similarity.fanOut(wide) eq wide,
      "already-wide input must not be repartitioned")
  }
}

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

  test("df-cap bounds the hot-shingle fan-out in exact Jaccard") {
    import spark.implicits._
    // 60 docs (ids multiples of 10, so the % 10 subset keeps them) all
    // sharing one boilerplate 3-gram; every other shingle is unique to
    // its doc+variant
    val docs = (1 to 60).map(i => (i * 10L, s"boiler plate common u$i v$i"))
      .toDF("doc_id", "text")
    // uncapped: the shared shingle alone fans out to C(60,2) = 1770
    // cross-doc candidate pairs, plus 60 base-variant pairs — the
    // quadratic hot-key blowup a 100 TB corpus would hit on any
    // boilerplate n-gram
    val uncapped = Dedup.ngramJaccard(docs, 0.0, maxDf = 1000000).count()
    assert(uncapped == 1830L, s"uncapped=$uncapped")
    // capped at df <= 50: the df=60 boilerplate shingle is dropped
    // BEFORE the self-join; only the base-variant pairs (via their
    // df=2 shingles) remain
    val capped = Dedup.ngramJaccard(docs, 0.0, maxDf = 50).count()
    assert(capped == 60L, s"capped=$capped")
  }
}

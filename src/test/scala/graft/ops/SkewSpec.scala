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

  test("pathological hot band: one dup cluster, AQE splits the band-join partition, pairs exact") {
    // one near-dup cluster holding a meaningful slice of the corpus —
    // every member shares every band key, so the LSH band self-join
    // concentrates C(k,2) pair production on ONE join key. The 100 TB
    // posture (Dedup.scala header): candidate generation stays an
    // equi-join and the hot key is AQE-skew-split across tasks (salting
    // is the documented escalation if one cluster exceeds an executor).
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // the pair stream feeds a distinct (its own exchange), and AQE
      // declines skew-splits that add a shuffle unless forced — at
      // scale you force it: the post-join exchange exists either way,
      // while an unsplit hot band serializes C(k,2) pair production
      // on one task
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // enough reducers that the hot band stands out from the median
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val k = 500
      // unique tail: md5-derived vocabulary, no accidental near-dups
      val unique = spark.read.format("graft.sources.SynthDocsSource")
        .option("rows", "2000").option("partitions", "8")
        .option("tokens", "16").load()
      // hot cluster: k docs with IDENTICAL text (ids above the tail;
      // the text id sits outside the unique tail's id range so no
      // tail doc accidentally joins the cluster)
      val cluster = spark.range(k)
        .select((col("id") + 100000L).as("doc_id"),
          lit(graft.sources.SynthDocsSource.text(999999L, 16)).as("text"))
      val corpus = unique.unionByName(cluster)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val pairs = Dedup.minhashPairs(corpus, 0.5)
      val got = pairs.collect()
      // exact: every intra-cluster pair at est_sim 1.0, nothing else
      assert(got.length == k * (k - 1) / 2,
        s"expected ${k * (k - 1) / 2} cluster pairs, got ${got.length}")
      assert(got.forall(_.getDouble(2) == 1.0))
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "hot band partition was not skew-split:\n" + plan.take(3000))
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
    val uncapped = Dedup.ngramJaccard(
      Dedup.ngramFixture(docs), 0.0, maxDf = 1000000).count()
    assert(uncapped == 1830L, s"uncapped=$uncapped")
    // capped at df <= 50: the df=60 boilerplate shingle is dropped
    // BEFORE the self-join; only the base-variant pairs (via their
    // df=2 shingles) remain
    val capped = Dedup.ngramJaccard(
      Dedup.ngramFixture(docs), 0.0, maxDf = 50).count()
    assert(capped == 60L, s"capped=$capped")
  }
}

package graft.ops

import graft.SparkSpec
import graft.ops.T

/** The Bloom contamination check's defining guarantee: NO FALSE
  * NEGATIVES — every doc the exact shingle join flags must also be
  * bloom-flagged (a Bloom filter can only err toward extra
  * positives). Asserted on the real fixture, plus a sanity bound on
  * the false-positive rate the 4 KB filter is sized for.
  */
class BloomContaminationSpec extends SparkSpec {

  test("bloom flags are a superset of exact contamination; FP rate bounded") {
    val rows = Pipeline.contaminationBloom(T(spark, sf, "documents"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    val falseNegatives = rows.filter { case (_, bloom, exact, _) =>
      exact && !bloom
    }
    assert(falseNegatives.isEmpty,
      s"bloom missed contaminated docs: ${falseNegatives.take(5)}")
    // flagged = exact + FP, never fewer
    val clean = rows.count(!_._3)
    val fps = rows.count(_._4)
    assert(clean == 0 || fps.toDouble / clean < 0.25,
      s"FP rate $fps/$clean above the filter's design range")
  }

  test("hit-filtered ground truth equals the full exact join") {
    // round-13: contaminationBloom's exact_contaminated verdict now
    // probes only bloom-HIT shingles (no false negatives => the
    // verdicts are identical). Pin that equivalence against the
    // independent full-stream join of Pipeline.contamination.
    val docs = T(spark, sf, "documents")
    val fromBloom = Pipeline.contaminationBloom(docs)
      .filter(org.apache.spark.sql.functions.col("exact_contaminated"))
      .select("train_id").collect().map(_.getLong(0)).toSet
    val fromExact = Pipeline.contamination(docs)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(fromBloom == fromExact,
      s"verdicts diverge: only-bloom=${(fromBloom -- fromExact).take(5)} " +
        s"only-exact=${(fromExact -- fromBloom).take(5)}")
  }
}

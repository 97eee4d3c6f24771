package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input guards: every operator family must survive an
  * empty corpus and single-row inputs without crashing (the 100 TB
  * posture includes partitions that are empty after pruning).
  */
class EdgeCaseSpec extends SparkSpec {

  private def emptyDocs = T(spark, sf, "documents").filter(col("doc_id") < 0)
  private def oneDoc = T(spark, sf, "documents").limit(1)

  test("dedup family returns empty (not error) on an empty corpus") {
    assert(Dedup.exactDedup(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, 0.5).count() == 0)
    assert(Dedup.minhashClusters(emptyDocs, 0.5).count() == 0)
    assert(Dedup.ngramJaccard(Dedup.ngramFixture(emptyDocs), 0.5).count() == 0)
    assert(Dedup.ngramContainment(Dedup.ngramFixture(emptyDocs), 0.8).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
  }

  test("containment scores every original/variant inclusion at 1.0") {
    val docs = T(spark, sf, "documents")
    val sub = Dedup.ngramFixture(docs)
    val rows = Dedup.ngramContainment(sub, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // fixture: the drop-first-token variant's shingle set is a subset
    // of its original's, so overlap must be exactly 1.0 — these are
    // the inclusion pairs Jaccard under-scores. The 1.0 guarantee
    // needs the VARIANT to retain >= 1 shingle after the df cap
    // (subset-ness then forces min = |variant| = inter), so the
    // expected set is gated on df-cap SURVIVAL, not just token count
    // — a fixture doc whose variant shingles were all hot would
    // otherwise fail this assert spuriously.
    val shAll = sub.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(col("toks"), 3))).as("sh"))
    val hot = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.MaxShingleDf).select("sh")
    val survivors = shAll.join(hot, Seq("sh"), "left_anti")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = sub
      .filter(col("doc_id") % 10 === 0 && size(col("toks")) > 3 &&
        (col("doc_id") + Dedup.VariantIdOffset) % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ < Dedup.VariantIdOffset)
      .filter(id => survivors(id + Dedup.VariantIdOffset))
    assert(expected.nonEmpty)
    expected.foreach { id =>
      val pair = (id, id + Dedup.VariantIdOffset)
      assert(rows.get(pair).contains(1.0),
        s"expected overlap 1.0 for inclusion pair $pair, got ${rows.get(pair)}")
    }
  }

  test("ngram ops run on a RAW corpus: no hidden subsample or variants") {
    import spark.implicits._
    // ids deliberately NOT multiples of 10: the old fixture-infected
    // ops would have silently dropped every row here
    val corpus = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("b", "c", "d", "e")), // contained in doc 1
      (3L, Seq("x", "y", "z"))).toDF("doc_id", "toks")
    val cont = Dedup.ngramContainment(corpus, 0.8).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(cont.head.getDouble(2) == 1.0)
    val jac = Dedup.ngramJaccard(corpus, 0.5).collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("bm25 family on empty and single-doc corpora") {
    assert(Analysis.bm25TopDocs(emptyDocs).count() == 0)
    assert(Analysis.bm25Query(emptyDocs).count() == 0)
    // single doc: every query term (all from that doc) scores it once
    val one = Analysis.bm25Query(oneDoc).collect()
    assert(one.nonEmpty)
    assert(one.forall(_.getLong(2) == oneDoc.collect().head.getLong(0)))
  }

  test("text analysis on empty and single-doc corpora") {
    assert(Analysis.tfidfTop3(emptyDocs).count() == 0)
    assert(Analysis.pmiPairs(emptyDocs, 1).count() == 0)
    assert(Analysis.repetitionScore(emptyDocs).count() == 0)
    assert(Analysis.chunkDocuments(emptyDocs).count() == 0)
    assert(Analysis.qualityScore(oneDoc).count() == 1)
    assert(Analysis.chunkDocuments(oneDoc).count() >= 1)
  }

  test("corpus-production ops on empty and single-doc corpora") {
    assert(Pipeline.contamination(emptyDocs).count() == 0)
    assert(Pipeline.seqPack(emptyDocs).count() == 0)
    assert(Pipeline.crossDedup(emptyDocs, 0.5).count() == 0)
    assert(Pipeline.sourceSample(emptyDocs).count() == 0)
    assert(Dedup.chunkDedup(emptyDocs).count() == 0)
    assert(Analysis.corpusStats(emptyDocs).count() == 0)
    assert(Pipeline.seqPack(oneDoc).count() == 1)
    // one doc + its exact copy: every chunk of the copy is a dup
    val cd = Dedup.chunkDedup(oneDoc).collect()
    assert(cd.length == 2 && cd(0).getLong(2) == 0 &&
      cd(1).getLong(2) == cd(1).getLong(1))
  }

  test("similarity on an empty embedding set") {
    val emptyEmb = T(spark, sf, "embeddings").filter(col("vec_id") < 0)
    assert(Similarity.knnBruteForce(emptyEmb, 5, 3).count() == 0)
    assert(Similarity.knnLsh(emptyEmb, 5, 3).count() == 0)
    assert(Similarity.knnIvf(emptyEmb, 5, 3, 2).count() == 0)
    assert(Similarity.embeddingNearDupLsh(emptyEmb, 0.9).count() == 0)
  }

  test("windows/aggregations on empty and single-row relational input") {
    val emptyOrders = T(spark, sf, "orders").filter(col("o_orderkey") < 0)
    assert(Relational.runningCustomerSpend(emptyOrders).count() == 0)
    // Spark's rollup/cube lower to Expand + grouped aggregate, so an
    // empty input has zero groups — no grand-total row (unlike
    // engines that special-case the () grouping set)
    assert(Relational.rollupAgg(emptyOrders).count() == 0)
    assert(Advanced.cubeAgg(
      T(spark, sf, "lineitem").filter(col("l_orderkey") < 0)).count() == 0)
    val one = T(spark, sf, "orders").limit(1)
    assert(Relational.leadNth(one).count() == 1)
    assert(Relational.page(one, 30, -1).count() == 1)
  }

  test("events pipelines on an empty stream table") {
    val emptyEv = T(spark, sf, "events").filter(col("event_id") < 0)
    assert(Events.userSessions(emptyEv).count() == 0)
    assert(Events.signupPurchaseFunnel(emptyEv).count() == 0)
    assert(Events.watermarkAdmitted(emptyEv).count() == 0)
    assert(Advanced.asofPurchaseClick(emptyEv).count() == 0)
  }
}

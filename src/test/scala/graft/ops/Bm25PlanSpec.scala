package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape pin for the persisted BM25 index probe: the scale claim
  * is that a probe reads only (a) the vocab-sized `kind=df` partition
  * for the term pick and (b) the postings BUCKETS the chosen terms
  * hash to, with the term IN-filter pushed into the parquet read —
  * never the whole postings table. Asserted on the executed plan's
  * scan nodes, not prose.
  */
class Bm25PlanSpec extends SparkSpec {

  test("probe scans prune kind+bucket partitions and push the token filter") {
    val docs = T(spark, sf, "documents")
    val dir = Files.createTempDirectory("bm25-plan").toString
    Bm25Index.build(docs, dir)
    val ex = Bm25Index.topDocs(spark, dir, 10, 3).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

    // postings scan: kind=post partition filter AND a bucket IN list
    // (the probed terms' buckets), with the token filter pushed down
    val postScan = ex.linesIterator
      .filter(_.contains("PartitionFilters")).find(_.contains("= post"))
    assert(postScan.isDefined, s"no kind=post partition filter:\n$ex")
    assert(postScan.get.contains("bucket") && postScan.get.contains(" IN "),
      s"postings scan not bucket-pruned: ${postScan.get}")
    assert(ex.contains("In(token,"),
      "token IN-filter not pushed to the postings parquet scan")
    // the stat fold reads only its own partition
    assert(ex.linesIterator.filter(_.contains("PartitionFilters"))
      .exists(_.contains("= stat")), "no kind=stat partition filter")
  }
}

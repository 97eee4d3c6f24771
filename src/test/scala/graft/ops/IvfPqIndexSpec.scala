package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ ([[Similarity.ivfBuildPq]]/[[Similarity.ivfPqQuery]]):
  * result parity with the inline [[Similarity.knnIvfPq]], and the two
  * prunings the layout exists for — cell-directory DPP and the ADC
  * stage reading the codes column WITHOUT the vector column.
  */
class IvfPqIndexSpec extends SparkSpec {

  test("persisted IVF-PQ matches inline; ADC scan reads codes, not vectors") {
    val emb = graft.ops.T(spark, sf, "embeddings")
    val dir = Files.createTempDirectory("graft-ivfpq-spec").toString
    Similarity.ivfBuildPq(emb, dir)

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val indexed = Similarity.ivfPqQuery(queries, dir, k = 3, nprobe = 2,
      shortlist = 16)
    val inline = Similarity.knnIvfPq(emb, nQueries = 10, k = 3, nprobe = 2,
      shortlist = 16)
    assert(indexed.collect().toSeq == inline.collect().toSeq,
      "persisted and inline IVF-PQ must rank identically")

    val plan = Similarity.ivfPqQuery(queries, dir, 3, 2, 16)
      .queryExecution.executedPlan.toString
    // probe join dynamically prunes cell directories
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    // the ADC-side scan projects (vec_id, codes) only: there must be a
    // cells scan whose ReadSchema has codes but NOT the vector column —
    // the compressed representation is what the full-corpus stage reads
    val scanSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(scanSchemas.exists(s => s.contains("codes") && !s.contains("v:")),
      s"no codes-only cells scan found in:\n${scanSchemas.mkString("\n")}")
  }

  test("append to a PQ index encodes the batch with the persisted codebook") {
    val emb = graft.ops.T(spark, sf, "embeddings")
    val dir = Files.createTempDirectory("graft-ivfpq-app").toString
    // build on 3/4, append the held-out quarter
    Similarity.ivfBuildPq(emb.filter(col("vec_id") % 4 =!= 3), dir)
    Similarity.ivfAppend(emb.filter(col("vec_id") % 4 === 3), dir)

    val cells = spark.read.parquet(s"$dir/cells")
    // every appended row must carry non-null codes — NULL codes would
    // silently vanish from the ADC posexplode, shrinking the corpus
    val appended = cells.filter(col("vec_id") % 4 === 3)
    val total = emb.filter(col("vec_id") % 4 === 3).count()
    assert(appended.count() == total)
    assert(appended.filter(col("codes").isNull).count() == 0,
      "appended vectors carry NULL codes")
    // and the codes are the SAME encoding the builder would produce:
    // rebuild on the full corpus with the same (base-subset) codebook
    // is not reproducible here, but an ADC query must at least be able
    // to RETURN an appended vector as a neighbor
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val hits = Similarity.ivfPqQuery(queries, dir, k = 3, nprobe = 2,
      shortlist = 16)
    assert(hits.filter(col("neighbor_id") % 4 === 3).count() > 0,
      "no appended vector ever surfaces in PQ query results")
  }
}

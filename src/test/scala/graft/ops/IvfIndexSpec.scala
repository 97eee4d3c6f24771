package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF index ([[Similarity.ivfBuild]]/[[Similarity.ivfQuery]]):
  * result parity with the inline [[Similarity.knnIvf]], and the
  * dynamic partition pruning the cell layout exists for.
  */
class IvfIndexSpec extends SparkSpec {

  test("persisted index answers match inline knnIvf and prune cells") {
    val emb = graft.ops.T(spark, sf, "embeddings")
    val dir = Files.createTempDirectory("graft-ivf-spec").toString
    Similarity.ivfBuild(emb, dir)

    // one directory per cell on disk
    val cellDirs = new java.io.File(s"$dir/cells").listFiles
      .filter(_.isDirectory).count(_.getName.startsWith("cell="))
    assert(cellDirs > 1, s"expected >1 cell directories, got $cellDirs")

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val indexed = Similarity.ivfQuery(queries, dir, k = 3, nprobe = 2)
    val inline = Similarity.knnIvf(emb, nQueries = 10, k = 3, nprobe = 2)
    assert(indexed.collect().toSeq == inline.collect().toSeq)

    // the probe join dynamically prunes cell partitions: the cells
    // scan carries a dynamicpruning partition filter, so unprobed
    // cell directories are never read
    val plan = Similarity.ivfQuery(queries, dir, 3, 2)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
  }
}

package graft.ops

import graft.SparkSpec

/** The label-propagation loop in [[Dedup.minhashClusters]] must cut
  * lineage every round. In local mode it uses executor-local
  * checkpoints (no distributed-FS round trip); when the session has a
  * checkpoint dir configured — on a cluster that's reliable storage —
  * it must switch to fault-tolerant `checkpoint()`, because an
  * executor lost mid-iteration would otherwise take its local
  * checkpoint blocks (and the job) with it.
  */
class CheckpointSpec extends SparkSpec {

  test("minhashClusters takes the reliable checkpoint path when a dir is set") {
    val docs = T(spark, sf, "documents")
    val local = Dedup.minhashClusters(docs, 0.5).collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val reliable = Dedup.minhashClusters(docs, 0.5).collect()
      assert(reliable.sameElements(local),
        "reliable-checkpoint run must produce identical clusters")
      // prove data actually went through the reliable path: checkpoint()
      // writes rdd-<id> directories under the configured dir
      val wroteRdds = java.nio.file.Files.walk(dir)
        .anyMatch(p => p.getFileName.toString.startsWith("rdd-"))
      assert(wroteRdds, s"no rdd-* checkpoint data under $dir")
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}

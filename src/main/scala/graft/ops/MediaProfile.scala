package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of the `ns_media_knn` pipeline —
  * the round-13 counterpart of [[IvfProfile]] for the round-12
  * verdict's ≤10 s done-bar: decode+cut, quantizer training,
  * assignment, and the probe tail are timed separately so the next
  * cut targets the measured dominant term.
  *
  * Usage: runMain graft.ops.MediaProfile [sfDir] [trainSample]
  */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val trainSample = args.lift(1).map(_.toInt)
      .getOrElse(Similarity.TrainSample)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mediaprofile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = T(spark, sfDir, "documents")
    val cut = t("decode + localCheckpoint") {
      Multimodal.mediaEmbeddingsCut(spark, docs)
    }
    val n = t("corpus count (cut)")(cut.count())
    println(s"[mediaprofile] n=$n stride=${Similarity.ivfStrideFor(n)} " +
      s"cells~${n / Similarity.ivfStrideFor(n)} train=$trainSample")
    val all = cut.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = t("quantizer training (collect)") {
      Similarity.trainedCents(all, 0L, trainSample)
        .orderBy("cid").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    }
    val assigned = all.withColumn("cell",
      graft.functions.VectorFunctions.nearest_cell(col("v"), col("nrm"),
        cents.map(_._1), cents.map(_._2), cents.map(_._3)))
    // count() prunes the cell column — force the kernel with an agg
    t("assignment (sum(cell) forces kernel)")(
      assigned.agg(sum("cell")).collect())
    val asg2 = assigned.localCheckpoint(true)
    t("probe tail over materialized assignment") {
      import spark.implicits._
      val centsDf = cents.toSeq.map(c => (c._1, c._2.toSeq, c._3))
        .toDF("cid", "cv", "cnrm")
      val qscored = all.filter(col("vec_id") < 50)
        .crossJoin(broadcast(centsDf))
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
          round(graft.functions.VectorFunctions.dot_product(col("v"), col("cv")) /
            (col("nrm") * col("cnrm")), 6).as("ccos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("ccos").desc, col("cid").asc)
      val qprobes = qscored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm"), col("cid").as("cell"))
      broadcast(qprobes).join(asg2, Seq("cell"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"),
          round(graft.functions.VectorFunctions.dot_product(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 6).as("cos_sim"))
        .count()
    }
    t("full knnIvf (fresh cut)") {
      Similarity.knnIvf(
        Multimodal.mediaEmbeddingsCut(spark, docs), 50, 3, 2).count()
    }
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of [[Similarity.ivfBuild]] — the
  * measurement behind the round-11 build-wall work: the round-10 coda
  * recorded a 63 s one-time build at the 200k-vector spot-gate and
  * hypothesized Lloyd-round job overhead; this main times each stage
  * separately (quantizer training, corpus assignment, flat write,
  * cell-partitioned write) so the fix targets the measured cost, not
  * the guess.
  *
  * Usage: runMain graft.ops.IvfProfile [sfDir] [stride] [trainSample]
  */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val strideArg = args.lift(1).map(_.toLong)
    val trainSample = args.lift(2).map(_.toInt)
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
      println(f"[ivfprofile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-ivfprof").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = t("corpus count")(emb.count())
    val stride = strideArg.filter(_ > 0)
      .getOrElse(Similarity.ivfStrideFor(n))
    println(s"[ivfprofile] n=$n stride=$stride cells~${n / stride} " +
      s"train=$trainSample")

    val all = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cents = t("quantizer training (collect)") {
      Similarity.trainedCents(all, stride, trainSample)
        .orderBy("cid").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    }
    val assigned = all.withColumn("cell",
      graft.functions.VectorFunctions.nearest_cell(col("v"), col("nrm"),
        cents.map(_._1), cents.map(_._2), cents.map(_._3)))
    t("assignment only (count)")(assigned.count())
    t("assignment + FLAT write")(
      assigned.write.mode("overwrite").parquet(s"$dir/flat"))
    t("assignment + partitionBy write")(
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/cells"))
    t("ivfBuild end-to-end")(
      Similarity.ivfBuild(emb, s"$dir/full", stride, trainSample))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-key skew report for the shuffled-hash band joins (round-13
  * advisor): the SHJ build side is one shuffle partition of the band
  * table and does NOT spill, so the claim "band keys are hash-balanced
  * and AQE's skew split covers the rest" should be MEASURED at scale,
  * not asserted. Prints the (band, key) group-size distribution of the
  * minhash band table over SPARK_GRAFT_SF_DIR's documents — max, p999
  * via approx, and the row mass of the single largest key — the
  * numbers behind PLANS.md's "largest band partition" note.
  */
object BandStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.ops.T(spark, sfDir, "documents")
    // same corpus shape the bench's LSH queries band over
    val sigs = graft.ops.Dedup.signatures(
      graft.ops.Dedup.corpusWithVariants(docs))
    val bandKeys = transform(sequence(lit(0), lit(graft.ops.Dedup.Bands - 1)),
      j => concat_ws("_",
        element_at(col("sig"), j * 2 + 1), element_at(col("sig"), j * 2 + 2)))
    val bands = sigs.select(col("doc_id"),
      posexplode(bandKeys).as(Seq("band", "key")))
    val sizes = bands.groupBy("band", "key").count()
    val stats = sizes.agg(
      count(lit(1)).as("n_keys"), max("count").as("max_key_rows"),
      expr("approx_percentile(count, 0.999)").as("p999"),
      expr("approx_percentile(count, 0.5)").as("p50")).head()
    val total = bands.count()
    println(s"""{"sf":"$sfDir","band_rows":$total,""" +
      s""""n_keys":${stats.getLong(0)},"max_key_rows":${stats.getLong(1)},""" +
      s""""p999_key_rows":${stats.getLong(2)},"p50_key_rows":${stats.getLong(3)},""" +
      s""""max_key_frac":${stats.getLong(1).toDouble / total}}""")
    spark.stop()
  }
}

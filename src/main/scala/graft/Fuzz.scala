package graft

import org.apache.spark.sql.SparkSession

/** Spark side of the differential query fuzzer
  * (`tools/fuzz_oracle.py`): registers the driver's parquet tables as
  * temp views (through [[graft.ops.T]], so `ts` normalization matches
  * every other query), executes each generated `<outDir>/spark_sql/
  * <name>.sql` file, and writes the result to `<outDir>/results/
  * <name>` parquet for the Python harness to compare against DuckDB
  * running the paired dialect rendering of the SAME random plan.
  *
  * The 217 fixed oracle queries can only catch semantic gaps they
  * express; the fuzzer samples the composition space the reference's
  * planner enumerates (solve.py:30-59) — filter/join/agg/window/
  * explode chains — with fresh random shapes every round.
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    tables.foreach { t =>
      if (new java.io.File(s"$sfDir/$t.parquet").exists())
        graft.ops.T(spark, sfDir, t).createOrReplaceTempView(t)
    }
    val sqlDir = new java.io.File(s"$outDir/spark_sql")
    val files = Option(sqlDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".sql")).sortBy(_.getName)
    // the .err sidecar path must exist even if the FIRST query fails
    // spark-side (round-12 advisor: parquet write creates it only on
    // success)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir, "results"))
    var failed = 0
    files.foreach { f =>
      val name = f.getName.stripSuffix(".sql")
      val sql = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/results/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] $name failed: ${e.getMessage}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/results", s"$name.err"),
          String.valueOf(e.getMessage))
      }
    }
    println(s"fuzz: ran ${files.length} queries, $failed spark-side errors")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: frequency estimation whose shuffle is a FIXED
  * depth x width cell grid no matter how large the corpus or its
  * vocabulary. The exact token groupBy shuffles O(vocab) rows — fine
  * until the vocabulary is a 100 TB corpus's noisy token space; the
  * sketch build shuffles at most depth*width partial cells per task
  * (map-side combine collapses the token stream into the grid before
  * the exchange), a constant ~100 KB regardless of input size.
  *
  * Every bucket index is deterministic salted-md5 arithmetic (same
  * [[H.hash30]] device as the dedup family), so Spark and DuckDB
  * build the SAME sketch with the SAME collisions — the query is
  * hash-checkable end to end, and its own output quantifies the
  * accuracy trade: `overestimate = est - exact` is >= 0 by the CMS
  * one-sided-error guarantee (a sketch cell only ever ADDS colliding
  * tokens' counts), which SketchSpec asserts over the whole
  * vocabulary, not just the reported top-k.
  */
object Sketch {

  val Depth = 4
  val Width = 4096

  private def bucket(r: org.apache.spark.sql.Column,
      token: org.apache.spark.sql.Column) =
    H.hash30(concat(lit("cms"), r.cast("string"), lit("|"), token)) %
      lit(Width.toLong)

  private def bucketSql(r: String, token: String) =
    s"(${H.duckHash30(s"'cms' || $r || '|' || $token")} % $Width)"

  /** Heavy hitters with self-measured sketch error: the top-k tokens
    * by exact count, each with its CMS estimate and overestimate.
    * The exact side exists to QUANTIFY the sketch (and to rank
    * deterministically); a pure-sketch serving path probes candidate
    * tokens against `cells` only — that path's shuffle is the fixed
    * grid, which SketchSpec measures.
    */
  def heavyHitters(docs: DataFrame, topK: Int = 20): DataFrame = {
    val toks = Tok.tokens(docs, "text").select("token")
    val rs = explode(array((0 until Depth).map(lit(_)): _*)).as("r")
    val cells = toks.select(col("token"), rs)
      .withColumn("bucket", bucket(col("r"), col("token")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val probes = exact.select(col("token"), col("exact"), rs)
      .withColumn("bucket", bucket(col("r"), col("token")))
    probes.join(cells, Seq("r", "bucket"))
      .groupBy("token", "exact").agg(min(col("cnt")).as("est"))
      .select(col("token"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overestimate"))
      .orderBy(col("exact").desc, col("token"))
      .limit(topK)
  }

  def heavyHittersOracle(topK: Int = 20): String =
    s"""WITH toks AS (
       |  SELECT t.token FROM documents, ${Tok.duckSplit} AS t(token)
       |  WHERE length(t.token) > 1),
       |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
       |cells AS (
       |  SELECT r, ${bucketSql("r", "token")} AS bucket, count(*) AS cnt
       |  FROM toks, rs GROUP BY 1, 2),
       |exact AS (SELECT token, count(*) AS exact FROM toks GROUP BY token),
       |probes AS (
       |  SELECT token, exact, r, ${bucketSql("r", "token")} AS bucket
       |  FROM exact, rs)
       |SELECT token, min(cnt) AS est, exact,
       |  min(cnt) - exact AS overestimate
       |FROM probes JOIN cells USING (r, bucket)
       |GROUP BY token, exact
       |ORDER BY exact DESC, token
       |LIMIT $topK""".stripMargin

  /** The pure-sketch side alone: build the cell grid. Exposed so the
    * spec can measure that its shuffle is the fixed grid, not the
    * token stream or the vocabulary.
    */
  def cmsCells(docs: DataFrame): DataFrame =
    Tok.tokens(docs, "text").select(col("token"),
        explode(array((0 until Depth).map(lit(_)): _*)).as("r"))
      .withColumn("bucket", bucket(col("r"), col("token")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
}

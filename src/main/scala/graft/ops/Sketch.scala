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
    // Touch the token STREAM exactly once (the map-side-combined
    // exact groupBy); every cell count is then a sum of exact counts
    // over the tokens hashing into it — identical numbers to counting
    // stream occurrences per cell directly (the oracle's form), but
    // the x Depth row blowup and the salted-md5 bucket arithmetic run
    // over the VOCABULARY, not the corpus (round-13: this was 4 md5s
    // per token OCCURRENCE — the whole cost of the query at the 100x
    // corpus, where stream/vocab > 40,000x).
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val rs = explode(array((0 until Depth).map(lit(_)): _*)).as("r")
    val probes = exact.select(col("token"), col("exact"), rs)
      .withColumn("bucket", bucket(col("r"), col("token")))
    // est per (token, r) via a window sum over the cell's members:
    // one vocab-sized shuffle, no second grid build + join
    val cnt = sum(col("exact")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("r", "bucket"))
    probes.withColumn("cnt", cnt)
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

  /** Single-pass grid build via the typed
    * [[graft.functions.CmsAggregator]]: no per-token row blowup —
    * each partition folds tokens into one dense 128 KB buffer and
    * only buffers merge. Cell-for-cell identical to [[cmsCells]]
    * (differentially asserted in SketchSpec); sparse cells drop on
    * output so the shapes compare directly.
    */
  def cmsCellsOnePass(docs: DataFrame): DataFrame = {
    val buckets = array((0 until Depth).map(r =>
      bucket(lit(r), col("token"))): _*)
    val grid = udaf(graft.functions.CmsAggregator.cmsGrid)
    Tok.tokens(docs, "text")
      .select(buckets.as("b"))
      .agg(grid(col("b")).as("grid"))
      .select(posexplode(col("grid")).as(Seq("i", "cnt")))
      .filter(col("cnt") > 0)
      .select(expr(s"i div $Width").cast("int").as("r"),
        pmod(col("i"), lit(Width)).cast("long").as("bucket"), col("cnt"))
  }

  // ------------------------------------------------------------ //
  // HyperLogLog distinct counting — the mergeable COUNT DISTINCT.

  /** Register count (2^RegBits). Standard-error ~ 1.04/sqrt(m) ~ 6.5%. */
  val HllM = 256
  private val RegBits = 8
  require(HllM == (1 << RegBits), "HllM must stay 2^RegBits")

  /** The hash window above the register index: hash60 gives 60 bits,
    * 8 pick the register, the remaining 52 feed the rank. */
  val HllW = 52

  /** Register index of a value: low 8 bits of its 60-bit hash. */
  def hllReg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    H.hash60(c) % HllM

  /** Register rank: leading-zero count (+1) of the hash's upper-52-bit
    * window, via the binary-string-length device (`conv(w,10,2)` here,
    * `bin(w)` in DuckDB — both render without leading zeros), so it is
    * exact integer arithmetic in both engines.
    */
  def hllRank(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // shiftright, NOT `/ 256`: Column `/` is double division, which
    // rounds hashes >= 2^53 before the cast and can disagree with the
    // oracle's integer `//` by one register rank
    val w = shiftright(H.hash60(c), RegBits)
    when(w === 0, lit(HllW + 1))
      .otherwise(lit(HllW + 1) - length(conv(w, 10, 2)))
  }

  /** Per-(source, register) max-rank table, built from a base/delta
    * split and merged by MAX — the point of the exercise: HLL
    * registers are the mergeable form of COUNT DISTINCT, so a 100 TB
    * corpus's nightly batch updates 256 longs per source instead of
    * re-shuffling the token universe.
    */
  private def hllRegisters(toks: DataFrame) =
    toks
      .select(col("source"), hllReg(col("token")).as("reg"),
        hllRank(col("token")).as("rank"))
      .groupBy("source", "reg").agg(max("rank").as("m"))

  /** Cardinality estimate from a (key, reg, m) max-rank register
    * table: exact-integer harmonic sum (power-of-two terms summed as
    * scaled BIGINTs — no float fold order), with the standard
    * linear-counting branch below 2.5m. Returns (key, hll_estimate).
    */
  def hllEstimate(regs: DataFrame, key: String): DataFrame = {
    val alphaM2 = lit(0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM)
    val scale = math.pow(2.0, HllW + 1)
    regs
      .withColumn("term",
        expr(s"shiftleft(CAST(1 AS BIGINT), ${HllW + 1} - m)"))
      .groupBy(key)
      .agg(count(lit(1)).as("n_regs"), sum(col("term")).as("zsum_scaled"))
      .withColumn("zsum_scaled",
        col("zsum_scaled") +
          (lit(HllM.toLong) - col("n_regs")) * lit(scale.toLong))
      .withColumn("v", lit(HllM.toLong) - col("n_regs"))
      .withColumn("harmonic",
        alphaM2 / (col("zsum_scaled").cast("double") / lit(scale)))
      .select(col(key),
        round(when(col("harmonic") <= lit(2.5 * HllM) && col("v") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v")))
          .otherwise(col("harmonic")), 4).as("hll_estimate"))
  }

  /** Per-source distinct-token estimate: HLL harmonic mean over the
    * merged base/delta registers, reported next to the exact count so
    * the output quantifies its own error. The harmonic sum is exact:
    * 2^(rank) terms are summed as integers scaled by 2^(HllW+1) (every
    * term is a power of two <= 2^53, so the BIGINT sum is the exact
    * value of sum(2^-M) * 2^(HllW+1) — no float fold order anywhere
    * before the final division). Missing registers count as rank 0.
    */
  def hllDistinct(docs: DataFrame): DataFrame = {
    val toks = Tok.tokens(docs, "text")
      .select(col("source"), col("doc_id"), col("token"))
    val base = hllRegisters(toks.filter(col("doc_id") % 10 =!= 0)
      .select(col("source"), col("token")))
    val delta = hllRegisters(toks.filter(col("doc_id") % 10 === 0)
      .select(col("source"), col("token")))
    val merged = base.unionByName(delta)
      .groupBy("source", "reg").agg(max("m").as("m"))
    val est = hllEstimate(merged, "source")
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("token")).as("exact_distinct"))
    exact.join(est, "source")
      .select(col("source"), col("exact_distinct"), col("hll_estimate"),
        round((col("hll_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 4).as("rel_err"))
      .orderBy("source")
  }

  /** DuckDB CTE fragment: (key, hll_estimate) from a `regsCte` of
    * (key, reg, m) — the SQL twin of [[hllEstimate]], shared by every
    * HLL oracle so the arithmetic cannot drift between them.
    */
  def hllEstimateSqlCtes(key: String, regsCte: String): String = {
    val alphaM2 = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM
    s"""sums AS (
       |  SELECT $key,
       |    $alphaM2 / ((sum(1::BIGINT << (${HllW + 1} - m))
       |        + ($HllM - count(*)) * (1::BIGINT << ${HllW + 1}))::DOUBLE
       |      / ${scaleLit}) AS harmonic,
       |    $HllM - count(*) AS v
       |  FROM $regsCte GROUP BY $key),
       |est AS (
       |  SELECT $key,
       |    round(CASE WHEN harmonic <= ${2.5 * HllM} AND v > 0
       |      THEN $HllM * ln($HllM.0 / v) ELSE harmonic END, 4)
       |      AS hll_estimate
       |  FROM sums)""".stripMargin
  }

  def hllDistinctOracle: String = {
    val h = H.duckHash60("token")
    s"""WITH toks AS (
       |  SELECT source, doc_id, t.token
       |  FROM documents, ${Tok.duckSplit} AS t(token)
       |  WHERE length(t.token) > 1),
       |ranked AS (
       |  SELECT source, doc_id, $h % $HllM AS reg,
       |    $h // $HllM AS w
       |  FROM toks),
       |regs AS (
       |  SELECT source, reg,
       |    CASE WHEN w = 0 THEN ${HllW + 1}
       |         ELSE ${HllW + 1} - length(bin(w)) END AS rank,
       |    doc_id % 10 = 0 AS is_delta
       |  FROM ranked),
       |halves AS (
       |  SELECT source, reg, is_delta, max(rank) AS m
       |  FROM regs GROUP BY source, reg, is_delta),
       |merged AS (
       |  SELECT source, reg, max(m) AS m FROM halves GROUP BY source, reg),
       |${hllEstimateSqlCtes("source", "merged")},
       |exact AS (
       |  SELECT source, count(DISTINCT token) AS exact_distinct
       |  FROM toks GROUP BY source)
       |SELECT source, exact_distinct, hll_estimate,
       |  round((hll_estimate - exact_distinct) / exact_distinct, 4)
       |    AS rel_err
       |FROM exact JOIN est USING (source)
       |ORDER BY source""".stripMargin
  }

  private def scaleLit: String = s"${math.pow(2.0, HllW + 1).toLong}.0"
}

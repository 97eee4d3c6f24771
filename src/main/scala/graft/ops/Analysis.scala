package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID
  * by stopword-profile scoring, quality scoring, token counting
  * (whitespace + BPE-ish estimate), and rolling-hash document
  * fingerprinting.
  *
  * All are single-pass per-document projections/aggregations —
  * map-side only until the (optional) groupBy, so they scale linearly
  * and pipeline inside whole-stage codegen. Every score is a fixed
  * IEEE expression over exact integers, so values are reproducible
  * across engines without rounding.
  */
object Analysis {

  /** Profile vocabularies for the language/topic classifier. The
    * driver corpus is synthetic DB-English; profiles demonstrate the
    * n-gram/stopword-ratio mechanism.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "data"),
    "db" -> Seq("join", "query", "scan", "hash", "merge", "sort"),
    "st" -> Seq("stream", "batch", "window"))

  /** Language-ID: per-doc ratio of tokens in each profile; prediction
    * is the argmax with ties broken by profile declaration order.
    */
  def langProfile(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val ratios = Profiles.map { case (name, words) =>
      (size(filter(col("toks"),
        w => w.isInCollection(words))).cast("double") /
        size(col("toks"))).as(s"r_$name")
    }
    val withR = toks.select((col("doc_id") +: ratios): _*)
    val pred = when(col("r_en") >= col("r_db") && col("r_en") >= col("r_st"), "en")
      .when(col("r_db") >= col("r_st"), "db")
      .otherwise("st")
    withR.withColumn("pred", pred).orderBy("doc_id")
  }

  def langProfileOracle: String = {
    val ratioExprs = Profiles.map { case (name, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, w -> w IN ($set)))::DOUBLE / len(toks) AS r_$name"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |r AS (SELECT doc_id,
       |  $ratioExprs
       |FROM t)
       |SELECT doc_id, r_en, r_db, r_st,
       |  CASE WHEN r_en >= r_db AND r_en >= r_st THEN 'en'
       |       WHEN r_db >= r_st THEN 'db'
       |       ELSE 'st' END AS pred
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: token count, type-token ratio, mean token
    * length, length saturation; combined into one score. Weights and
    * evaluation order identical to the oracle, so doubles match
    * exactly.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("n_chars"),
      split(col("text"), " ").as("toks"))
    val n = size(col("toks")).cast("double")
    val ttr = size(array_distinct(col("toks"))).cast("double") / n
    val meanLen = aggregate(col("toks"), lit(0L),
      (acc, w) => acc + length(w)).cast("double") / n
    val lenSat = least(n / lit(100.0), lit(1.0))
    t.select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        ttr.as("ttr"),
        meanLen.as("mean_token_len"),
        (ttr * lit(0.5) + lenSat * lit(0.3) +
          least(meanLen / lit(10.0), lit(1.0)) * lit(0.2)).as("quality"))
      .orderBy("doc_id")
  }

  def qualityScoreOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |m AS (SELECT doc_id,
       |    len(toks) AS n_tokens,
       |    len(list_distinct(toks))::DOUBLE / len(toks) AS ttr,
       |    (list_sum(list_transform(toks, w -> length(w))))::DOUBLE / len(toks)
       |      AS mean_token_len,
       |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_sat
       |  FROM t)
       |SELECT doc_id, n_tokens, ttr, mean_token_len,
       |  ttr * 0.5 + len_sat * 0.3 + least(mean_token_len / 10.0, 1.0) * 0.2
       |    AS quality
       |FROM m ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens, a BPE-ish subword estimate
    * (ceil(len/4) per word), and the chars/4 heuristic.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_ws_tokens"),
        aggregate(col("toks"), lit(0L),
          (acc, w) => acc + shiftright((length(w) + 3).cast("long"), 2))
          .as("n_bpe_est"),
        expr("n_chars div 4").as("n_chars_div4"))
      .orderBy("doc_id")

  def tokenStatsOracle: String =
    s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  len(toks) AS n_ws_tokens,
       |  (list_sum(list_transform(toks, w -> (length(w) + 3) // 4)))::BIGINT
       |    AS n_bpe_est,
       |  n_chars // 4 AS n_chars_div4
       |FROM t ORDER BY doc_id""".stripMargin

  /** TF-IDF: top-3 scoring tokens per document. tf = in-doc count,
    * idf = ln(N / df). The natural log can differ by an ulp between
    * libm implementations, so scores are rounded to 6dp and the
    * ranking runs on the ROUNDED score with a token tiebreak.
    * Scale: two grouped aggregations (doc-term, term) + a join with
    * the vocab-sized df table — no all-pairs anything. The df side is
    * deliberately UNHINTED: it is broadcast-small at test scale and
    * AQE will broadcast it from its runtime size, but a 100 TB
    * corpus's vocabulary (noisy tokens included) can exceed the
    * broadcast limit, and a forced broadcast() hint would OOM the
    * driver there; leaving the choice to AQE is the scale-safe
    * default. (The single-row n_docs count stays broadcast — a 1-row
    * side is always safe.)
    */
  def tfidfTop3(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("token"), col("tfidf"))
      .orderBy("doc_id", "rn")
  }

  val tfidfTop3Oracle: String =
    """WITH tok AS (SELECT doc_id, t.token FROM documents,
      |    unnest(string_split(text, ' ')) AS t(token)),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (SELECT doc_id, tf.token,
      |    round(tf * ln(n_docs::DOUBLE / df.df), 6) AS tfidf
      |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
      |ranked AS (SELECT doc_id, token, tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tfidf DESC, token ASC) AS rn
      |  FROM scored)
      |SELECT doc_id, rn, token, tfidf FROM ranked WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  /** Okapi BM25 retrieval scoring (k1=1.2, b=0.75): top `k` documents
    * per query term for the `nTerms` highest-df vocabulary terms —
    * the standard retrieval scorer data-curation pipelines use for
    * similarity-based quality filtering and retrieval-style
    * decontamination. idf is the (1 + ...) form, so scores stay
    * positive at df > n/2.
    *
    * Scale posture: tf/dl/df are one tokenize pass with map-side
    * combine; the query-term cut is TakeOrderedAndProject (orderBy +
    * limit — no single-partition window over the vocabulary), terms
    * and corpus stats broadcast into the tf stream, and the per-term
    * top-k runs on [[graft.plans.TopKPerKey]] — partial bounded heaps
    * per map partition, so the shuffle carries <= nTerms x k rows per
    * partition even though high-df terms touch nearly every document
    * (a 20-slot window partition over corpus-sized groups would
    * funnel the whole scored stream through nTerms tasks).
    */
  /** The BM25 corpus statistics — (tf, dl, df, stats) — shared by
    * [[bm25TopDocs]] and [[bm25Query]]: dl and df both fold the tf
    * table, so the corpus is tokenized + exploded ONCE, not three
    * times (dl = sum of tf per doc exactly). avgdl comes from the
    * EXACT long sum (not avg(): partition-order-dependent double
    * summation could drift an ulp from the oracle), divided by the
    * DOCUMENT count, not count(dl rows) — a doc whose text yields
    * zero tokens drops out of dl but still belongs to the collection
    * avgdl averages over, and it is what the oracle twin divides by.
    */
  private def bm25Frames(
      docs: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum("dl").as("sum_dl")))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    (tf, dl, df, stats)
  }

  /** The unrounded per-(term, doc) Okapi BM25 contribution (k1=1.2,
    * b=0.75; idf in the (1 + ...) form, so scores stay positive at
    * df > n/2). Expects `tf`, `df`, `dl`, `n_docs`, `avgdl` in scope.
    */
  private[ops] def bm25Contrib: Column =
    log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
    (col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) *
        (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))

  def bm25TopDocs(docs: DataFrame, nTerms: Int = 20,
      k: Int = 3): DataFrame = {
    val (tf, dl, df, stats) = bm25Frames(docs)
    val qterms = df.orderBy(col("df").desc, col("token").asc)
      .limit(nTerms)
    val scored = tf.join(broadcast(qterms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("token"), col("doc_id"),
        round(bm25Contrib, 6).as("score"))
    val top = graft.plans.TopKPerKey.topK(scored, Seq("token"),
      Seq(col("score").desc, col("doc_id").asc), k)
    // rn over the already-cut <= nTerms x k rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(col("score").desc, col("doc_id").asc)
    top.withColumn("rn", row_number().over(w))
      .select(col("token"), col("rn"), col("doc_id"), col("score"))
      .orderBy("token", "rn")
  }

  /** The CTE chain of [[bm25TopDocsOracle]] over an arbitrary source
    * relation (a table name or an earlier CTE carrying (doc_id, text))
    * — composable into larger oracles, e.g. scoring the KEPT corpus of
    * an incremental build.
    */
  def bm25TopDocsCtes(nTerms: Int = 20, k: Int = 3,
      src: String = "documents"): String =
    s"""tok AS (SELECT doc_id, t.token FROM $src,
       |    unnest(string_split(text, ' ')) AS t(token)),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT (SELECT count(*) FROM $src) AS n_docs,
       |    (SELECT sum(dl) FROM dl)::DOUBLE /
       |      (SELECT count(*) FROM $src) AS avgdl),
       |qterms AS (SELECT token, df FROM df
       |           ORDER BY df DESC, token ASC LIMIT $nTerms),
       |scored AS (SELECT q.token, tf.doc_id,
       |    round(
       |      ln(1.0 + (n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2 /
       |        (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))),
       |      6) AS score
       |  FROM tf JOIN qterms q ON tf.token = q.token
       |          JOIN dl ON tf.doc_id = dl.doc_id
       |          CROSS JOIN stats),
       |ranked AS (SELECT token, doc_id, score,
       |    row_number() OVER (PARTITION BY token
       |      ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM scored)""".stripMargin

  /** Same formula, literal for literal, as [[bm25TopDocs]]. */
  def bm25TopDocsOracle(nTerms: Int = 20, k: Int = 3): String =
    s"""WITH ${bm25TopDocsCtes(nTerms, k)}
       |SELECT token, rn, doc_id, score FROM ranked WHERE rn <= $k
       |ORDER BY token, rn""".stripMargin

  /** Multi-term BM25 QUERY scoring (round 15): score a whole query —
    * a term set — per document by summed per-term BM25, the
    * retrieval-style decontamination shape ([[bm25TopDocs]] scores
    * single terms). The deterministic query fixture: the `nQueries *
    * qTerms` highest-df terms (df desc, token asc), chopped into
    * `nQueries` disjoint `qTerms`-term queries in rank order — both
    * engines derive identical queries from the data alone.
    *
    * Exactness: per-term contributions are QUANTIZED to integer
    * micro-units (round(x * 1e6) as long) before the per-(query, doc)
    * sum, so the sum is exact long arithmetic — no
    * partition-order-dependent double summation for a 3-term sum to
    * drift an ulp from DuckDB's — and the presented score is one
    * exact long->double division.
    *
    * Scale posture: same single tokenize pass ([[bm25Frames]]), query
    * map and corpus stats broadcast into the tf stream, per-(query,
    * doc) sum map-side combinable, per-query top-k on the
    * [[graft.plans.TopKPerKey]] partial heaps (nQueries keys — far
    * under the heap guard) so the shuffle carries <= nQueries x k
    * rows per partition, not the scored stream.
    */
  def bm25Query(docs: DataFrame, nQueries: Int = 5, qTerms: Int = 3,
      k: Int = 3): DataFrame = {
    val (tf, dl, df, stats) = bm25Frames(docs)
    val ranked = df.orderBy(col("df").desc, col("token").asc)
      .limit(nQueries * qTerms)
    // rank -> query id over the already-cut nQueries*qTerms rows (the
    // bare window is fine: the limit bounds it, like bm25TopDocs' rn)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("token").asc)
    val qmap = ranked.withColumn("r", row_number().over(w))
      .select((floor((col("r") - 1) / qTerms) + 1).cast("int")
          .as("query_id"),
        col("token"), col("df"))
    val perTerm = tf.join(broadcast(qmap), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(bm25Contrib * lit(1000000.0)).cast("long").as("contrib"))
    val scored = perTerm.groupBy("query_id", "doc_id")
      .agg((sum("contrib") / lit(1000000.0)).as("score"),
        count(lit(1)).as("n_terms"))
    val top = graft.plans.TopKPerKey.topK(scored, Seq("query_id"),
      Seq(col("score").desc, col("doc_id").asc), k)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    top.withColumn("rn", row_number().over(w2))
      .select(col("query_id"), col("rn"), col("doc_id"), col("score"),
        col("n_terms"))
      .orderBy("query_id", "rn")
  }

  /** Same formula and quantization, literal for literal, as
    * [[bm25Query]].
    */
  def bm25QueryOracle(nQueries: Int = 5, qTerms: Int = 3,
      k: Int = 3): String =
    s"""WITH tok AS (SELECT doc_id, t.token FROM documents,
       |    unnest(string_split(text, ' ')) AS t(token)),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
       |    (SELECT sum(dl) FROM dl)::DOUBLE /
       |      (SELECT count(*) FROM documents) AS avgdl),
       |ranked AS (SELECT token, df,
       |    row_number() OVER (ORDER BY df DESC, token ASC) AS r
       |  FROM df),
       |qmap AS (SELECT ((r - 1) // $qTerms) + 1 AS query_id, token, df
       |  FROM ranked WHERE r <= ${nQueries * qTerms}),
       |contrib AS (SELECT q.query_id, tf.doc_id,
       |    CAST(round(
       |      ln(1.0 + (n_docs - q.df + 0.5) / (q.df + 0.5)) *
       |      (tf.tf * 2.2 /
       |        (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)))
       |      * 1000000) AS BIGINT) AS contrib
       |  FROM tf JOIN qmap q ON tf.token = q.token
       |          JOIN dl ON tf.doc_id = dl.doc_id
       |          CROSS JOIN stats),
       |agg AS (SELECT query_id, doc_id,
       |    sum(contrib) / 1000000.0 AS score, count(*) AS n_terms
       |  FROM contrib GROUP BY 1, 2),
       |cut AS (SELECT query_id, doc_id, score, n_terms,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM agg)
       |SELECT query_id, rn, doc_id, score, n_terms FROM cut WHERE rn <= $k
       |ORDER BY query_id, rn""".stripMargin

  /** PMI co-occurrence: pointwise mutual information of token pairs
    * co-occurring in a document, over the top candidate pairs.
    * Bounded by vocabulary^2 regardless of corpus size (pair counts
    * are map-side combinable), which is what makes PMI tractable at
    * 100 TB: the shuffle carries vocab^2 partial counts, not the
    * corpus.
    */
  def pmiPairs(docs: DataFrame, minPairDocs: Long = 50): DataFrame = {
    // SORTED distinct tokens: pairs enumerated with i < j are then
    // already (a < b)-normalized AND unique per doc — no per-pair
    // least/greatest and no distinct() over generated pairs.
    val docToks = docs.select(col("doc_id"),
      array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    val n = docToks.select(count(lit(1)).as("n_docs"))
    val tokDocs = docToks.select(col("doc_id"), explode(col("toks")).as("t"))
    val tokDf = tokDocs.groupBy("t").agg(count(lit(1)).as("df"))
    // Pair keys are DENSE INT IDS, not strings (round-13: the pair
    // stream is the whole cost — |corpus| * m^2/2 rows; at the 100x
    // corpus that is 137M (string, string) structs whose hashing and
    // map-side-combine dominated the query. Ids are assigned in TOKEN
    // SORT ORDER over the df >= minPairDocs vocabulary — pair_df <=
    // min(df_a, df_b), so a pair with either token below the floor
    // can never qualify, and pruning BEFORE pair generation also
    // shrinks the quadratic blowup. Id order == token order, so i < j
    // normalization survives the mapping.
    //
    // The assignment itself is DISTRIBUTED (round-14; was one bare
    // row_number window, i.e. the whole qualifying vocab sorted on a
    // single core — fine under the floor at bench scale, but a 100 TB
    // corpus plausibly qualifies 10^7-10^8 tokens). zipWithIndex
    // pattern, kept inside Catalyst: range-repartition by token
    // (global order ACROSS partitions), rank within each partition
    // (parallel sorts), then add the partition's start offset — a
    // running sum over per-partition counts, a window over
    // numPartitions rows, not vocab rows. Same total order ==> ids
    // bit-identical to the serial row_number; the oracle twin (which
    // never sees ids) is untouched.
    val W = org.apache.spark.sql.expressions.Window
    val vocab = tokDf.filter(col("df") >= minPairDocs)
      .repartitionByRange(col("t"))
      .withColumn("pid", spark_partition_id())
    val local = vocab.withColumn("local",
      row_number().over(W.partitionBy("pid").orderBy("t")))
    // the offsets side is numPartitions rows — bounded by cluster
    // config, not data — and stays UNHINTED like every vocab-sized
    // side here: AQE broadcasts it at runtime (PlanShapeSpec pins
    // that no join in this query is force-broadcast)
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(
        W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    val idDf = local.join(offsets, "pid")
      .withColumn("id", (col("off") + col("local")).cast("int"))
      .select("t", "df", "id")
    // map each doc's token array to sorted id arrays: explode-join-
    // regroup (one linear shuffle of the token stream; the id side is
    // unhinted — AQE broadcasts it when small, see tfidfTop3's doc)
    val docIds = tokDocs.join(idDf.select("t", "id"), "t")
      .groupBy("doc_id").agg(array_sort(collect_list("id")).as("ids"))
    val pairs = docIds.select(
        explode(flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
            struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("ia"), col("p.b").as("ib"))
    val pairDf = pairs.groupBy("ia", "ib").agg(count(lit(1)).as("pair_df"))
      .filter(col("pair_df") >= minPairDocs)
    pairDf
      .join(idDf.select(col("id").as("ia"), col("t").as("a"),
        col("df").as("df_a")), "ia")
      .join(idDf.select(col("id").as("ib"), col("t").as("b"),
        col("df").as("df_b")), "ib")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("pair_df"),
        round(log((col("pair_df") * col("n_docs")).cast("double") /
          (col("df_a") * col("df_b"))), 6).as("pmi"))
      .orderBy("a", "b")
  }

  def pmiPairsOracle(minPairDocs: Long = 50): String =
    s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |  FROM documents),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |td AS (SELECT doc_id, unnest(toks) AS t FROM d),
       |df AS (SELECT t, count(*) AS df FROM td GROUP BY t),
       |pr AS (SELECT DISTINCT x.doc_id,
       |    least(x.t, y.t) AS a, greatest(x.t, y.t) AS b
       |  FROM td x JOIN td y ON x.doc_id = y.doc_id AND x.t < y.t),
       |pdf AS (SELECT a, b, count(*) AS pair_df FROM pr GROUP BY a, b
       |        HAVING count(*) >= $minPairDocs)
       |SELECT pdf.a, pdf.b, pair_df,
       |  round(ln((pair_df * n_docs)::DOUBLE / (fa.df * fb.df)), 6) AS pmi
       |FROM pdf JOIN df fa ON pdf.a = fa.t JOIN df fb ON pdf.b = fb.t
       |CROSS JOIN n
       |ORDER BY pdf.a, pdf.b""".stripMargin

  /** Repetition scoring (Gopher/C4-style quality filter): fraction of
    * the document's bigrams occupied by its single most frequent
    * bigram. High values flag template/boilerplate text. One map-side
    * pass: bigrams per doc stay inside the row (array ops), no
    * explode-shuffle of the corpus.
    */
  def repetitionScore(docs: DataFrame): DataFrame = {
    // alias the token array first: inlined, every element_at inside
    // the shingle lambda would re-split the text
    val tokenized = docs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val toks = col("toks")
    val bigrams = Dedup.shingles(toks, 2)
    // top bigram count = length of the longest run in the SORTED
    // bigram array, computed with a fold: (prev, run, best)
    val sorted = array_sort(bigrams)
    val best = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, b) => {
        val run = when(b === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(b.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    tokenized
      .select(col("doc_id"),
        (size(toks) - 1).cast("long").as("n_bigrams"),
        best.as("top_bigram_n"),
        (best.cast("double") / (size(toks) - 1).cast("double"))
          .as("repetition"))
      .orderBy("doc_id")
  }

  /** Oracle via the obviously-correct quadratic form (count every
    * distinct bigram, take the max) — DuckDB 1.0's `list_reduce`
    * mis-folds struct accumulators, so the run-length formulation is
    * Spark-side only.
    */
  def repetitionScoreOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |b AS (SELECT doc_id, len(toks) - 1 AS n_bigrams,
       |    list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1]) AS bs
       |  FROM t),
       |m AS (SELECT doc_id, n_bigrams,
       |    list_max(list_transform(list_distinct(bs),
       |      d -> len(list_filter(bs, x -> x = d)))) AS top_bigram_n
       |  FROM b)
       |SELECT doc_id, n_bigrams, top_bigram_n,
       |  top_bigram_n::DOUBLE / n_bigrams AS repetition
       |FROM m ORDER BY doc_id""".stripMargin

  val ChunkSize = 50
  val ChunkStride = 40

  /** Document chunking for training pipelines: overlapping
    * [[ChunkSize]]-token windows at [[ChunkStride]] stride (last
    * partial window kept when >= stride boundary). Map-side explode —
    * chunk rows inherit the document's partitioning, no shuffle.
    */
  def chunkDocuments(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val starts = sequence(lit(0),
      greatest((size(toks) - 1).cast("int"), lit(0)), lit(ChunkStride))
    docs.select(col("doc_id"), toks.as("toks"),
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(ChunkSize)))
          .as("chunk"),
        least(size(col("toks")) - col("start"), lit(ChunkSize))
          .as("chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  def chunkDocumentsOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, toks,
       |    unnest(range(0, greatest(len(toks) - 1, 0) + 1, $ChunkStride))
       |      AS start
       |  FROM t)
       |SELECT doc_id, (start // $ChunkStride)::INT AS chunk_idx,
       |  array_to_string(toks[start + 1 : start + $ChunkSize], ' ') AS chunk,
       |  least(len(toks) - start, $ChunkSize)::INT AS chunk_tokens
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  /** Regexes for [[scrubPii]], shared with the oracle generator
    * (portable across Java regex and RE2).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII scrubbing (training-data redaction): plant a deterministic
    * email + phone per document, then redact both with portable
    * regexes and count the redactions. Map-side only — at 100 TB this
    * pipelines inside the scan's codegen stage.
    */
  def scrubPii(docs: DataFrame): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val noEmail = regexp_replace(planted, EmailRe, "<EMAIL>")
    docs.select(col("doc_id"),
        regexp_replace(noEmail, PhoneRe, "<PHONE>").as("scrubbed"),
        regexp_count(planted, lit(EmailRe)).as("n_emails"),
        regexp_count(planted, lit(PhoneRe)).as("n_phones"))
      .orderBy("doc_id")
  }

  def scrubPiiOracle: String =
    s"""WITH p AS (SELECT doc_id,
       |    text || ' contact user' || doc_id ||
       |    '@example.com or +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
       |      AS planted
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(planted, '$EmailRe', '<EMAIL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed,
       |  len(regexp_extract_all(planted, '$EmailRe'))::INT AS n_emails,
       |  len(regexp_extract_all(planted, '$PhoneRe'))::INT AS n_phones
       |FROM p ORDER BY doc_id""".stripMargin

  /** End-to-end quality-filter decision (the C4/Gopher-style keep/drop
    * gate): combine the language profile, quality score, and
    * repetition signals into one keep decision and report counts per
    * (predicted lang, keep). Every signal is row-local, so the only
    * shuffles are the doc_id joins of three map-side frames and the
    * tiny final aggregate.
    */
  def qualityFilterSummary(docs: DataFrame): DataFrame = {
    // every signal is row-local, so compute all three in ONE
    // projection — no doc_id joins at all; the oracle's CTE-join
    // formulation is value-identical because the signal expressions
    // are shared with the standalone queries' oracles.
    // The token array is projected FIRST: referencing the aliased
    // column keeps CollapseProject from re-inlining the split into
    // every one of the ~10 signal expressions (the split is the
    // expensive part — re-evaluating it per signal multiplied the
    // row cost ~10x)
    val tokenized = docs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val toks = col("toks")
    val n = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / n
    val meanLen = aggregate(toks, lit(0L),
      (acc, w) => acc + length(w)).cast("double") / n
    val lenSat = least(n / lit(100.0), lit(1.0))
    val quality = ttr * lit(0.5) + lenSat * lit(0.3) +
      least(meanLen / lit(10.0), lit(1.0)) * lit(0.2)

    val sortedBigrams = array_sort(Dedup.shingles(toks, 2))
    val best = aggregate(
      sortedBigrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, b) => {
        val run = when(b === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(b.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val repetition = best.cast("double") / (size(toks) - 1).cast("double")

    val ratios = Profiles.map { case (name, words) =>
      (size(filter(toks, w => w.isInCollection(words))).cast("double") / n)
        .as(s"r_$name")
    }
    tokenized
      .select((Seq(quality.as("quality"), repetition.as("repetition")) ++
        ratios): _*)
      .select(
        when(col("r_en") >= col("r_db") && col("r_en") >= col("r_st"), "en")
          .when(col("r_db") >= col("r_st"), "db").otherwise("st").as("pred"),
        (col("quality") > 0.5 && col("repetition") < 0.05).as("keep"))
      .groupBy("pred", "keep")
      .agg(count(lit(1)).as("n"))
      .orderBy("pred", "keep")
  }

  def qualityFilterOracle: String = {
    def strip(sql: String) = sql.replaceAll("ORDER BY [^|]*$", "")
    s"""WITH q AS (${strip(qualityScoreOracle)}),
       |r AS (${strip(repetitionScoreOracle)}),
       |l AS (${strip(langProfileOracle)})
       |SELECT l.pred,
       |  (q.quality > 0.5 AND r.repetition < 0.05) AS keep,
       |  count(*) AS n
       |FROM q JOIN r USING (doc_id) JOIN l USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** URL canonicalization dedup (the C4-style crawl-dedup step):
    * plant a messy URL per doc (mixed-case host, tracking query,
    * trailing slash), canonicalize with `parse_url` (lowercased host +
    * query-stripped, slash-trimmed path), and group pages by canonical
    * URL. Map-side canonicalization, one fixed-width-key groupBy.
    */
  def urlDedup(docs: DataFrame): DataFrame = {
    val url = concat(lit("https://Host"), col("doc_id") % 50,
      lit(".Example.COM/path"), col("doc_id") % 20,
      lit("/?utm_source=x&id="), col("doc_id"))
    val host = lower(parse_url(url, lit("HOST")))
    val path = regexp_replace(parse_url(url, lit("PATH")), "/$", "")
    docs.select(col("doc_id"), concat(host, path).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_pages"), min(col("doc_id")).as("first_doc"))
      .orderBy("canonical_url")
  }

  val urlDedupOracle: String =
    s"""WITH u AS (SELECT doc_id,
       |    'https://Host' || (doc_id % 50) || '.Example.COM/path' ||
       |    (doc_id % 20) || '/?utm_source=x&id=' || doc_id AS url
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    lower(regexp_extract(url, '://([^/]+)', 1)) ||
       |    regexp_replace(regexp_extract(url, '://[^/]+([^?]*)', 1), '/$$', '')
       |      AS canonical_url
       |  FROM u)
       |SELECT canonical_url, count(*) AS n_pages, min(doc_id) AS first_doc
       |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin

  val FpMod = 2147483647L

  /** Document fingerprint: left-fold polynomial rolling hash over the
    * 30-bit token hashes, fp = (fp*31 + h) mod (2^31-1). acc < 2^31,
    * acc*31 + h < 2^36 + 2^30: ANSI-overflow-safe.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        aggregate(transform(col("toks"), w => H.hash30(w)), lit(0L),
          (acc, h) => (acc * 31 + h) % lit(FpMod)).as("fingerprint"))
      .orderBy("doc_id")

  def fingerprintOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  list_reduce(
       |    list_prepend(0, list_transform(toks, w -> ${H.duckHash30("w")})),
       |    (acc, h) -> (acc * 31 + h) % $FpMod) AS fingerprint
       |FROM t ORDER BY doc_id""".stripMargin

  /** Gopher-style rule filter (after Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * table of quality heuristics): the canonical pre-LM rule gate —
    * word-count bounds, mean-word-length bounds, symbol-to-word
    * ratio, fraction of alphabetic words, and stopword presence —
    * each surfaced as its own boolean plus the conjunction, per doc.
    * All row-local projections over one token-array alias (the
    * CollapseProject lesson: alias the split ONCE), so the whole gate
    * is a single map pass at any corpus size.
    */
  def gopherFilter(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val n = size(col("toks")).cast("double")
    val meanLen = aggregate(col("toks"), lit(0L),
      (acc, w) => acc + length(w)).cast("double") / n
    val alphaFrac = size(filter(col("toks"),
      w => w.rlike("[a-zA-Z]"))).cast("double") / n
    val symbolFrac = size(filter(col("toks"),
      w => w.rlike("^[^a-zA-Z0-9]+$"))).cast("double") / n
    val stopHits = size(array_intersect(col("toks"),
      array(GopherStopwords.map(lit): _*)))
    t.select(col("doc_id"),
        (n >= 5 && n <= 100000).as("ok_word_count"),
        (meanLen >= 2.0 && meanLen <= 12.0).as("ok_mean_word_len"),
        (symbolFrac <= 0.1).as("ok_symbol_ratio"),
        (alphaFrac >= 0.8).as("ok_alpha_words"),
        (stopHits >= 2).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_alpha_words") &&
          col("ok_stopwords"))
      .orderBy("doc_id")
  }

  /** The stopword set Gopher's "contains at least 2 stop words" rule
    * uses (shared with the oracle generator).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The gopher metric CTE (`m`, expects a preceding `t(doc_id,
    * toks)`) and the keep conjunction — shared between the standalone
    * oracle and composed pipelines so the rule set cannot drift.
    */
  def gopherMetricsCte: String = {
    val stops = GopherStopwords.map(w => s"'$w'").mkString(", ")
    s"""m AS (SELECT doc_id,
       |    len(toks)::DOUBLE AS n,
       |    (list_sum(list_transform(toks, w -> length(w))))::DOUBLE
       |      / len(toks) AS mean_len,
       |    len(list_filter(toks, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
       |      / len(toks) AS alpha_frac,
       |    len(list_filter(toks, w -> regexp_matches(w, '^[^a-zA-Z0-9]+$$')))::DOUBLE
       |      / len(toks) AS symbol_frac,
       |    len(list_intersect(list_distinct(toks), [$stops])) AS stop_hits
       |  FROM t)""".stripMargin
  }

  val gopherKeepCond: String =
    "n >= 5 AND n <= 100000 AND mean_len >= 2.0 AND mean_len <= 12.0 " +
      "AND symbol_frac <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2"

  /** The vocabulary-independent subset of the gate (everything except
    * the stopword rule) — what a composed pipeline applies to a
    * corpus whose vocabulary the English stopword list doesn't cover.
    */
  val gopherStructuralCond: String =
    "n >= 5 AND n <= 100000 AND mean_len >= 2.0 AND mean_len <= 12.0 " +
      "AND symbol_frac <= 0.1 AND alpha_frac >= 0.8"

  def gopherFilterOracle: String = {
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |$gopherMetricsCte
       |SELECT doc_id,
       |  n >= 5 AND n <= 100000 AS ok_word_count,
       |  mean_len >= 2.0 AND mean_len <= 12.0 AS ok_mean_word_len,
       |  symbol_frac <= 0.1 AS ok_symbol_ratio,
       |  alpha_frac >= 0.8 AS ok_alpha_words,
       |  stop_hits >= 2 AS ok_stopwords,
       |  (n >= 5 AND n <= 100000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
       |    AND symbol_frac <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2
       |    AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Bigram language-model score per document — the perplexity-proxy
    * quality signal (the role KenLM perplexity plays in CCNet-style
    * corpus filtering, self-contained: the corpus is its own LM).
    * score(doc) = mean over adjacent token pairs of
    * ln((c(w1,w2) + 1) / (c(w1) + V)) — add-one smoothed conditional
    * log-likelihood; V = unigram vocabulary size. Unusually repetitive
    * or templated docs score high, gibberish scores low.
    *
    * Scale posture: the bigram stream is FIRST collapsed to
    * (doc_id, w1, w2) -> m (one map-side-combinable aggregation), and
    * both count tables derive from that collapsed frame — so the
    * count-table joins run over per-doc-DISTINCT bigrams, not the raw
    * token stream (repetitive docs, the ones an LM filter exists for,
    * are exactly the ones this shrinks most). The per-doc mean is
    * recovered exactly as sum(m * ln)/sum(m). AQE broadcasts the
    * count tables when they fit, shuffles otherwise (unhinted, same
    * reasoning as TF-IDF). Nothing is ever all-pairs and no state
    * exceeds O(observed bigrams).
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val bi = toks.select(col("doc_id"), posexplode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (w, i) -> struct(w as w1, toks[i + 1] as w2))"))
        .as(Seq("pos", "p")))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w2").isNotNull)
    val docBi = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
    val biCnt = docBi.groupBy("w1", "w2").agg(sum("m").as("c12"))
    val uniCnt = docBi.groupBy("w1").agg(sum("m").as("c1"))
    val vocab = toks.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    docBi.join(biCnt, Seq("w1", "w2"))
      .join(uniCnt, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(round(
        sum(col("m") *
          log((col("c12") + lit(1)).cast("double") / (col("c1") + col("v")))) /
          sum(col("m")), 4)
        .as("lm_score"))
      .orderBy("doc_id")
  }

  def lmScoreOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bi AS (SELECT doc_id, u.i AS pos, toks[u.i] AS w1, toks[u.i + 1] AS w2
      |  FROM t, unnest(range(1, len(toks))) AS u(i)),
      |db AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi GROUP BY doc_id, w1, w2),
      |bic AS (SELECT w1, w2, sum(m) AS c12 FROM db GROUP BY w1, w2),
      |unic AS (SELECT w1, sum(m) AS c1 FROM db GROUP BY w1),
      |v AS (SELECT count(DISTINCT u.w) AS v FROM t, unnest(toks) AS u(w))
      |SELECT doc_id,
      |  round(sum(m * ln((c12 + 1)::DOUBLE / (c1 + v))) / sum(m), 4) AS lm_score
      |FROM db JOIN bic USING (w1, w2) JOIN unic USING (w1) CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Zipf fit: the slope of ln(freq) ~ ln(rank) over the top-k
    * vocabulary — the corpus-health diagnostic (natural language sits
    * near -1; templated/boilerplate corpora drift). The regression
    * runs AFTER aggregation over the vocab-sized count table, so the
    * global rank window and the single-row regression are both
    * O(vocab), never O(corpus).
    */
  def zipfFit(docs: DataFrame, topK: Int = 1000): DataFrame = {
    val counts = Tok.tokens(docs, "text")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .agg(
        round(regr_slope(log(col("cnt").cast("double")),
          log(col("rank").cast("double"))), 4).as("zipf_slope"),
        count(lit(1)).as("n_top"))
  }

  def zipfFitOracle(topK: Int = 1000): String =
    s"""WITH toks AS (
       |  SELECT t.token FROM documents, ${Tok.duckSplit} AS t(token)
       |  WHERE length(t.token) > 1),
       |counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
       |ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC)
       |    AS rank FROM counts)
       |SELECT round(regr_slope(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 4)
       |    AS zipf_slope,
       |  count(*) AS n_top
       |FROM ranked WHERE rank <= $topK""".stripMargin

  /** Per-source corpus profile: doc counts plus token-length quantiles
    * (exact interpolated percentiles — both engines define the
    * continuous quantile identically) and mean char length. The
    * monitoring query every corpus build runs per shard; one grouped
    * aggregation, map-side combinable except the exact percentiles,
    * whose state is per-source and bounded by shard doc count (for a
    * streaming-scale variant, swap in approx_percentile).
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(percentile(col("n_toks"), lit(0.5)), 2).as("p50_toks"),
        round(percentile(col("n_toks"), lit(0.9)), 2).as("p90_toks"),
        round(avg(col("n_chars")), 2).as("mean_chars"))
      .orderBy("source")

  def corpusStatsOracle: String =
    """SELECT source, count(*) AS n_docs,
      |  round(quantile_cont(len(string_split(text, ' ')), 0.5), 2) AS p50_toks,
      |  round(quantile_cont(len(string_split(text, ' ')), 0.9), 2) AS p90_toks,
      |  round(avg(n_chars), 2) AS mean_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Quality-curriculum sampling: band documents by their quality
    * score ([[qualityScore]]'s formula — fixed VALUE thresholds,
    * `floor(quality * 10)`, NOT data quantiles: quantiles would need
    * a global sort/window, banding is map-only and gives the same
    * curriculum dial), then keep a deterministically-hash-sampled
    * fraction that RISES with the band — band b keeps (b+1)/10 of its
    * docs. One map-side-combined aggregate reports per band how many
    * docs/tokens survive: the mixing table a curriculum data loader
    * consumes. Whole plan is scan -> project -> agg; nothing wide.
    */
  def qualitySample(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("toks"))
    val n = size(col("toks")).cast("double")
    val ttr = size(array_distinct(col("toks"))).cast("double") / n
    val meanLen = aggregate(col("toks"), lit(0L),
      (acc, w) => acc + length(w)).cast("double") / n
    val lenSat = least(n / lit(100.0), lit(1.0))
    val quality = ttr * lit(0.5) + lenSat * lit(0.3) +
      least(meanLen / lit(10.0), lit(1.0)) * lit(0.2)
    val banded = t.select(col("text"),
      least(floor(quality * 10).cast("int"), lit(9)).as("band"),
      size(col("toks")).cast("long").as("n_toks"))
    banded
      .withColumn("keep",
        H.hash60(col("text")) % 1000 < (col("band") + 1) * lit(100))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("n_kept"),
        sum(when(col("keep"), col("n_toks"))).as("kept_toks"))
      .orderBy("band")
  }

  def qualitySampleOracle: String =
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
       |  FROM documents),
       |m AS (SELECT text, len(toks)::BIGINT AS n_toks,
       |    len(list_distinct(toks))::DOUBLE / len(toks) AS ttr,
       |    (list_sum(list_transform(toks, w -> length(w))))::DOUBLE /
       |      len(toks) AS mean_len,
       |    least(len(toks)::DOUBLE / 100.0, 1.0) AS len_sat
       |  FROM t),
       |b AS (SELECT n_toks,
       |    least(floor((ttr * 0.5 + len_sat * 0.3 +
       |      least(mean_len / 10.0, 1.0) * 0.2) * 10)::INT, 9) AS band,
       |    ${H.duckHash60("text")} % 1000 < (least(floor((ttr * 0.5 +
       |      len_sat * 0.3 + least(mean_len / 10.0, 1.0) * 0.2)
       |      * 10)::INT, 9) + 1) * 100 AS keep
       |  FROM m)
       |SELECT band, count(*) AS n_docs,
       |  count(CASE WHEN keep THEN 1 END) AS n_kept,
       |  sum(CASE WHEN keep THEN n_toks END)::BIGINT AS kept_toks
       |FROM b GROUP BY band ORDER BY band""".stripMargin

  /** The planted per-source boilerplate header (the fixture pattern
    * the dedup family uses: construct the phenomenon in-plan so the
    * detector has a known answer — every even doc gets this 5-token
    * header, so its 3 internal trigrams must be flagged and nothing
    * else).
    */
  val BoilerHeader = "promo visit example site now"

  /** C4/RefinedWeb-style per-source boilerplate detection: a token
    * TRIGRAM occurring in >= `minDf` of a source's documents is
    * boilerplate (the line-frequency rule, adapted to the fixture's
    * single-line docs); each document reports how many of its trigram
    * positions are boilerplate-covered.
    *
    * Scale shape: the trigram stream is one Generate (map-only,
    * O(tokens) rows); per-(source, trigram) document frequency is a
    * two-level map-side-combined aggregate; the boilerplate table is
    * bounded by ACTUALLY-REPEATED content per source (the only thing
    * worth shipping), so at corpus scale the stream-side join
    * broadcasts it — the same posture as span dedup. Removal (strip
    * the covered spans) is a filter on the same covered flag; the
    * query reports the detection surface, which is the part with a
    * known oracle.
    */
  def boilerplate(docs: DataFrame, minDf: Double = 0.4): DataFrame = {
    val withHeader = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 2 === 0,
        concat(lit(BoilerHeader + " "), col("text")))
        .otherwise(col("text")).as("t"))
    val toks = withHeader
      .select(col("doc_id"), col("source"), split(col("t"), " ").as("a"))
      .filter(size(col("a")) >= 3)
    val tris = toks.select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(0), size(col("a")) - 3),
        i => concat_ws(" ", element_at(col("a"), i + 1),
          element_at(col("a"), i + 2), element_at(col("a"), i + 3))))
        .as("tri"))
    val srcN = withHeader.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    val df = tris.select("source", "tri", "doc_id").distinct()
      .groupBy("source", "tri")
      .agg(count(lit(1)).as("df"))
    val boiler = df.join(srcN, Seq("source"))
      .filter(col("df") >= lit(minDf) * col("n_docs"))
      .select(col("source").as("b_source"), col("tri").as("b_tri"))
    tris
      .join(boiler, col("source") === col("b_source") &&
        col("tri") === col("b_tri"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        count(col("b_tri")).as("n_boiler"),
        round(count(col("b_tri")) / count(lit(1)), 4).as("boiler_frac"))
      .orderBy("doc_id")
  }

  /** Per-key skew report — the measurement that decides WHEN to salt:
    * for the heaviest `topN` keys, their share of the table, the skew
    * ratio (count / mean count, i.e. how many "fair shares" the key
    * occupies), and a salt factor (ceil of that ratio, in exact
    * integer arithmetic) — the number of sub-splits that brings the
    * key back to average partition weight. One map-side-combined
    * count, then the (total, nkeys) pair as a SCALAR aggregate
    * broadcast back over the counts — NOT a whole-frame window, which
    * would funnel all O(distinct keys) rows (10^9 user ids at 100 TB)
    * through one partition. The two consumers of the counts subtree
    * are the identical exchange, so AQE's ReusedExchange keeps this
    * one corpus scan. `j4_salted_join` / `g3_salted_agg` are the
    * consumers of the recommendation.
    */
  def skewReport(df: DataFrame, key: String, topN: Int = 5): DataFrame = {
    val counts = df.groupBy(col(key).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("total"),
      count(lit(1)).as("nkeys"))
    counts
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"),
        round(col("cnt") * col("nkeys") / col("total"), 4).as("skew_ratio"),
        expr("(cnt * nkeys + total - 1) DIV total").cast("long")
          .as("salt_factor"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }

  def skewReportOracle(key: String = "user_id", topN: Int = 5): String =
    s"""WITH counts AS (SELECT $key AS key, count(*) AS cnt
       |    FROM events GROUP BY $key),
       |wide AS (SELECT key, cnt,
       |    sum(cnt) OVER () AS total,
       |    count(*) OVER () AS nkeys
       |  FROM counts)
       |SELECT key, cnt,
       |  round(cnt / total, 6) AS share,
       |  round(cnt * nkeys / total, 4) AS skew_ratio,
       |  ((cnt * nkeys + total - 1) // total)::BIGINT AS salt_factor
       |FROM wide ORDER BY cnt DESC, key ASC LIMIT $topN""".stripMargin

  def boilerplateOracle(minDf: Double = 0.4): String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 2 = 0 THEN '$BoilerHeader ' || text
       |         ELSE text END AS t
       |  FROM documents),
       |toks AS (SELECT doc_id, source, string_split(t, ' ') AS a FROM d),
       |tris AS (SELECT doc_id, source,
       |    a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS tri
       |  FROM toks, unnest(range(1, len(a) - 1)) AS u(i)),
       |srcn AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
       |df AS (SELECT source, tri, count(DISTINCT doc_id) AS df
       |       FROM tris GROUP BY 1, 2),
       |boiler AS (SELECT df.source, df.tri FROM df JOIN srcn USING (source)
       |           WHERE df >= $minDf * n_docs)
       |SELECT t.doc_id, count(*) AS n_tri, count(b.tri) AS n_boiler,
       |  round(count(b.tri) / count(*)::DOUBLE, 4) AS boiler_frac
       |FROM tris t LEFT JOIN boiler b
       |  ON t.source = b.source AND t.tri = b.tri
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registry entry is (name, query builder, optional DuckDB oracle
  * SQL over the same parquet tables). Column names and row order are
  * aligned between the Spark plan and the oracle SQL; every
  * double-valued aggregate is rounded identically on both sides so the
  * driver's hash compare is stable.
  */
object SparkEntry {

  private case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  private def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  // ---------------------------------------------------------------- //

  private lazy val registry: Seq[Q] = Seq(

    // W1+W2 flagship: top-90%-mass tokens (basic_tasks.py:92-105).
    q("w2_top90",
      """WITH toks AS (
        |  SELECT t.token FROM documents,
        |    unnest(string_split_regex(lower(text), '\W+')) AS t(token)
        |  WHERE length(t.token) > 1),
        |counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        |tot AS (SELECT sum(cnt) AS total FROM counts),
        |w AS (SELECT token, cnt,
        |        sum(cnt) OVER (ORDER BY cnt DESC, token ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM counts)
        |SELECT token, cnt FROM w, tot
        |WHERE running < 0.9 * total
        |ORDER BY cnt DESC, token""".stripMargin) {
      (s, dir) => Text.topPTokens(T(s, dir, "documents"), 0.9)
    },

    // W2 detail form: the token stream filtered to top-90% tokens.
    q("w2_top90_detail",
      """WITH toks AS (
        |  SELECT doc_id, t.token FROM documents,
        |    unnest(string_split_regex(lower(text), '\W+')) AS t(token)
        |  WHERE length(t.token) > 1),
        |counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        |tot AS (SELECT sum(cnt) AS total FROM counts),
        |w AS (SELECT token, cnt,
        |        sum(cnt) OVER (ORDER BY cnt DESC, token ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM counts)
        |SELECT doc_id, token FROM toks
        |WHERE token IN (SELECT token FROM w, tot WHERE running < 0.9 * total)
        |ORDER BY doc_id, token""".stripMargin) {
      (s, dir) => Text.topPDetail(T(s, dir, "documents"), 0.9)
    },

    // G1/G3: Q1-style pricing summary.
    q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) => Relational.pricingSummary(T(s, dir, "lineitem"))
    },

    // G1: value_counts with deterministic tiebreak (basic_tasks.py:82-89).
    q("g1_value_counts",
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin) {
      (s, dir) => Text.valueCounts(T(s, dir, "events"), "event_type")
    },

    // P2: prefix predicate (basic_tasks.py:43-51).
    q("p2_prefix_filter",
      """SELECT doc_id, lang, source FROM documents
        |WHERE text LIKE 'the %' ORDER BY doc_id""".stripMargin) {
      (s, dir) => Relational.prefixFilter(T(s, dir, "documents"), "the ")
    },

    // P4: boolean flag with null default (basic_tasks.py:103).
    q("p4_bool_flag",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE coalesce(o_totalprice > 200000, false)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) => Relational.boolFlagFilter(T(s, dir, "orders"))
    },

    // P6: deterministic dedup — first event per (user, type) by time.
    q("p6_dedup_first",
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) {
      (s, dir) =>
        Relational.dedupKeepFirst(T(s, dir, "events"),
            Seq("user_id", "event_type"), Seq("ts", "event_id"))
          .select("user_id", "event_type", "event_id")
          .orderBy("user_id", "event_type")
    },

    // J2: broadcast left lookup join (basic_tasks.py:102).
    q("j2_left_join",
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        Relational.ordersWithCustomer(T(s, dir, "orders"), T(s, dir, "customer"))
    },

    // J4: semi join.
    q("j4_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        Relational.customersWithOrders(T(s, dir, "customer"), T(s, dir, "orders"))
    },

    // J4: anti join.
    q("j4_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        Relational.customersWithoutOrders(T(s, dir, "customer"), T(s, dir, "orders"))
    },

    // 3-way join + agg: revenue per market segment.
    q("j4_revenue_by_segment",
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        Relational.revenueBySegment(T(s, dir, "lineitem"),
          T(s, dir, "orders"), T(s, dir, "customer"))
    },

    // G2: scalar sum (basic_tasks.py:99).
    q("g2_scalar_sum",
      "SELECT round(sum(l_quantity), 2) AS total_qty FROM lineitem") {
      (s, dir) => Relational.scalarSum(T(s, dir, "lineitem"))
    },

    // G3: distinct aggregates.
    q("g3_distinct_agg",
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) => Relational.distinctAgg(T(s, dir, "lineitem"))
    },

    // G3: rollup grouping sets.
    q("g3_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) {
      (s, dir) => Relational.rollupAgg(T(s, dir, "orders"))
    },

    // W1: per-key running cumulative sum (basic_tasks.py:100).
    q("w1_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, dir) => Relational.runningCustomerSpend(T(s, dir, "orders"))
    },

    // W3: rank / dense_rank / lag.
    q("w3_ranks",
      """SELECT o_custkey, o_orderkey, rnk, drnk, prev_price FROM (
        |  SELECT o_custkey, o_orderkey,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    round(lag(o_totalprice, 1) OVER w, 2) AS prev_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE prev_price IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, dir) => Relational.orderRanks(T(s, dir, "orders"))
    },

    // O2: stable pagination, page 2 of 30 (serve_view_df.py:108-116).
    q("o2_page",
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn > 30 AND rn <= 60
        |ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin) {
      (s, dir) => Relational.page(T(s, dir, "orders"), 30, 1)
    },

    // O3: top-k per group.
    q("o3_topk_per_group",
      """SELECT p_brand, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin) {
      (s, dir) => Relational.topKPerGroup(T(s, dir, "part"), 3)
    },

    // Set operations.
    q("set_union",
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin) {
      (s, dir) =>
        Relational.nationKeySetOp(T(s, dir, "customer"), T(s, dir, "supplier"), "union")
    },

    q("set_intersect",
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT DISTINCT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) {
      (s, dir) =>
        Relational.nationKeySetOp(T(s, dir, "customer"), T(s, dir, "supplier"), "intersect")
    },

    q("set_except",
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT DISTINCT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) {
      (s, dir) =>
        Relational.nationKeySetOp(T(s, dir, "customer"), T(s, dir, "supplier"), "except")
    },
  )

  // ---------------------------------------------------------------- //

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Text.topPTokens(T(spark, "/root/testdata/sf0.001", "documents"), 0.9)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(x => x.name -> x.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(x => x.oracle.map(x.name -> _)).toMap
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator library — one builder per SURVEY.md §2.B row.
  * All pure built-in `Column` expressions (codegen'd, zero UDFs).
  *
  * Scale notes: only genuinely BOUNDED dimension sides carry an
  * explicit `broadcast(...)` hint (nation/region, 1-row scalars);
  * tables that scale linearly with the corpus (customer/supplier/
  * part) are left unhinted so AQE's size gate decides — a forced hint
  * there is a driver OOM at a billion-row dimension. Fact-fact joins
  * shuffle on their keys and rely on AQE for skew. Filters are plain
  * parquet-pushable predicates.
  */
object Relational {

  /** Q1-style multi-aggregate (G1/G3): pricing summary per flag/status. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** P2: prefix predicate (reference filters lines starting "From:",
    * basic_tasks.py:43-51). Pushable `StartsWith` filter.
    */
  def prefixFilter(docs: DataFrame, prefix: String): DataFrame =
    docs.filter(col("text").startsWith(prefix))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** P4: boolean-flag predicate with null default
    * (`coalesce(flag, false)`, basic_tasks.py:103).
    */
  def boolFlagFilter(orders: DataFrame): DataFrame =
    orders
      .withColumn("bigspender",
        when(col("o_totalprice") > 200000, lit(true)))
      .filter(coalesce(col("bigspender"), lit(false)))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** P6: exact deduplication on a subset key. Deterministic variant of
    * dropDuplicates: keep the first row per key by a total order
    * (dropDuplicates keeps an arbitrary row, which cannot be
    * oracle-checked).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).asc): _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** J2: left equi-join lookup (flag table broadcast onto a stream,
    * basic_tasks.py:102). Customer scales with the corpus, so the
    * hint is AQE's size-gated call, not ours (PlanShapeSpec pins the
    * fixture-scale broadcast).
    */
  def ordersWithCustomer(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"))
      .orderBy("o_orderkey")

  /** J4: semi join — customers having at least one order. */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J4: anti join — customers with no orders. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** 3-way join + agg: revenue per market segment. lineitem-orders is
    * the fact-fact shuffle join; customer broadcasts under AQE's size
    * gate (unhinted — it scales with the corpus).
    */
  def revenueBySegment(li: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame =
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")

  /** G2: scalar sum (basic_tasks.py:99). */
  def scalarSum(li: DataFrame): DataFrame =
    li.agg(round(sum(col("l_quantity")), 2).as("total_qty"))

  /** G3: multi-key agg with distinct counts. */
  def distinctAgg(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** G3: grouping sets via rollup. */
  def rollupAgg(orders: DataFrame): DataFrame =
    orders.rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** W1: running cumulative sum per key (cumsum, basic_tasks.py:100),
    * partitioned by customer so the window shuffles on o_custkey and
    * never needs a global sort.
    */
  def runningCustomerSpend(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W3: rank / dense_rank / lag within partitions. */
  def orderRanks(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"))
      .filter(col("prev_price").isNotNull)
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W3: distribution window functions — percent_rank, cume_dist,
    * first/last value over the per-customer price order.
    */
  def priceDistribution(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_totalprice")).over(wFull).as("cheapest"),
        last(col("o_totalprice")).over(wFull).as("priciest"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** O2: pagination with a stable total order (serve_view_df.py:108-116,
    * PAGE_SIZE=30; negative page counts from the END, as the
    * reference's head/tail arithmetic does), over the reversed order
    * for negative pages so no total count is needed.
    *
    * The page is carved from a `limit((idx+1)*pageSize)` prefix —
    * Spark plans the sort+limit as TakeOrderedAndProject (per-
    * partition top-k, merge k-sized results), so the table is never
    * globally sorted; the row_number window then runs over at most
    * one page-prefix of rows, not the corpus. Deep random pages at
    * 100 TB go through the Serve page-file path instead; this is the
    * interactive contract where idx is human-sized.
    */
  def page(orders: DataFrame, pageSize: Int, pageIdx: Int): DataFrame = {
    val fwd = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val (order, idx) =
      if (pageIdx >= 0) (fwd, pageIdx)
      else (Seq(col("o_totalprice").asc, col("o_orderkey").desc), -pageIdx - 1)
    val prefix = orders.select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(order: _*)
      .limit(pageSize * (idx + 1))
    val w = Window.orderBy(order: _*)
    prefix.select(col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") > pageSize * idx)
      .drop("rn")
      .orderBy(fwd: _*)
  }

  /** O3: top-k per group. */
  def topKPerGroup(part: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    part.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
      .orderBy(col("p_brand").asc, col("rn").asc)
      .drop("rn")
  }

  /** G3: statistical aggregates — exact interpolated percentiles
    * (both engines define the continuous quantile identically),
    * sample stddev, and correlation, rounded for cross-engine float
    * stability.
    */
  def statsByFlag(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))
      .orderBy("l_returnflag")

  /** F-series breadth: common string functions. */
  def stringFunctions(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        upper(col("c_mktsegment")).as("seg_upper"),
        reverse(col("c_name")).as("name_rev"),
        translate(col("c_name"), "#", "-").as("name_dash"),
        repeat(lit("ab"), 3).as("abab"))
      .orderBy("c_custkey")

  /** G3: misc aggregates — deterministic list aggregation (collected,
    * sorted, joined), bitwise OR/AND, and arg-min/max keyed on a
    * UNIQUE column so ties cannot flip the result.
    */
  def miscAggs(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"),
        bit_or(col("o_custkey")).as("cust_bits_or"),
        bit_and(col("o_custkey")).as("cust_bits_and"),
        min_by(col("o_totalprice"), col("o_orderkey")).as("first_order_price"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("last_order_price"))
      .orderBy("o_orderstatus")

  /** Pivot: event counts per user spread across type columns. The
    * pivot values are given explicitly — one pass, deterministic
    * column order (an unspecified pivot needs a distinct-values
    * pre-pass and sorts columns by value).
    */
  def pivotEventCounts(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** W3 range frame: per customer, how many of their orders fall
    * within +/-10000 of each order's price (value-based frame, so the
    * result is order-independent and tie-safe).
    */
  def ordersInPriceBand(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, 10000L)
    orders.select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_in_band"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W3 ntile: price quartile of each order within its customer. */
  def orderQuartiles(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set ops: union / intersect / except on nation keys of two entity
    * tables (SURVEY §2.B set-operations row).
    */
  /** W3: lead / nth_value — next order's price and the 2nd-cheapest
    * price per customer over an unbounded frame.
    */
  def leadNth(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(col("o_custkey"), col("o_orderkey"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_cheapest"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set ops with bag semantics: INTERSECT ALL / EXCEPT ALL keep
    * duplicate multiplicity (Spark `intersectAll`/`exceptAll`).
    */
  def nationKeyBagOp(customer: DataFrame, supplier: DataFrame, op: String): DataFrame = {
    val c = customer.select(col("c_nationkey").as("nationkey"))
    val s = supplier.select(col("s_nationkey").as("nationkey"))
    val r = op match {
      case "intersect_all" => c.intersectAll(s)
      case "except_all"    => c.exceptAll(s)
    }
    r.groupBy("nationkey").agg(count(lit(1)).as("n")).orderBy("nationkey")
  }

  /** Priority values for [[crosstabStatusPriority]]'s oracle
    * generator (pinned — the crosstab's column set must be stable).
    */
  val Priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** `df.stat.crosstab` surface: status x priority contingency table.
    * Internally a pivoted count — one shuffle, map-side combined.
    */
  def crosstabStatusPriority(orders: DataFrame): DataFrame =
    orders.stat.crosstab("o_orderstatus", "o_orderpriority")
      .withColumnRenamed("o_orderstatus_o_orderpriority", "status")
      .orderBy("status")

  def crosstabOracle: String = {
    val cells = Priorities.map(p =>
      s"""sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END)::BIGINT AS "$p"""")
      .mkString(",\n  ")
    s"""SELECT o_orderstatus AS status,
       |  $cells
       |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin
  }

  /** `unpivot` (melt) surface: wide per-line rate columns to long
    * (key, value) rows — the inverse of pivot, map-only (no shuffle).
    */
  def unpivotRates(li: DataFrame): DataFrame =
    li.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_discount"), col("l_tax")),
        "rate_kind", "rate")
      .orderBy("l_orderkey", "l_linenumber", "rate_kind")

  def nationKeySetOp(customer: DataFrame, supplier: DataFrame, op: String): DataFrame = {
    val c = customer.select(col("c_nationkey").cast("int").as("nationkey")).distinct()
    val s = supplier.select(col("s_nationkey").cast("int").as("nationkey")).distinct()
    val r = op match {
      case "union"     => c.union(s).distinct()
      case "intersect" => c.intersect(s)
      case "except"    => c.except(s)
    }
    r.orderBy("nationkey")
  }
}

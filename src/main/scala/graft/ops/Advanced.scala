package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced join/query patterns beyond the reference's surface
  * (SURVEY.md §2.B J4 row: semi/anti/range/as-of "provided by the
  * engine since the north star is full DataFrame capability").
  */
object Advanced {

  /** As-of join without a range join: for every purchase event, the
    * most recent prior click by the same user.
    *
    * The scalable pattern: union both sides, one shuffle on user_id,
    * and a running `last` window carries the latest click timestamp
    * forward — O(n log n) per key, no quadratic range-join fan-out,
    * no broadcast requirement. (A range-condition join would fan out
    * per pair and is the plan to avoid at 100 TB.)
    */
  def asofPurchaseClick(events: DataFrame): DataFrame = {
    val tagged = events.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"),
      when(col("event_type") === "click", col("ts")).as("click_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("prev_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("prev_click_ts"))
      .orderBy("event_id")
  }

  /** Salted join: identical semantics to a plain key join, with the
    * big side's rows salted into `salt` sub-keys and the small side
    * replicated once per salt value — the standard skew mitigation
    * when one key dominates (AQE skew-split handles moderate skew;
    * salting is the explicit fix for pathological keys). The result
    * is oracle-checked against the UNSALTED join, proving semantics
    * are unchanged. The replicated side is deliberately UNHINTED:
    * supplier scales with the corpus, so whether the salted copies
    * broadcast or shuffle is AQE's size-gated call (salting spreads
    * the hot key either way).
    */
  def saltedRevenueByNation(li: DataFrame, supplier: DataFrame,
      nation: DataFrame, salt: Int = 8): DataFrame = {
    val big = li.withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(salt)))
    val small = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
      .withColumn("salt", explode(sequence(lit(0L), lit(salt - 1L))))
    big.join(small,
        col("l_suppkey") === col("s_suppkey") && big("salt") === small("salt"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Correlated EXISTS through the SQL surface (spark.sql over temp
    * views): customers with at least one order above the threshold.
    */
  def sqlExists(spark: SparkSession, sfDir: String): DataFrame = {
    T(spark, sfDir, "customer").createOrReplaceTempView("customer")
    T(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Scalar subquery through the SQL surface: orders above the global
    * average price.
    */
  def sqlScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    T(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q3 shape: shipping priority — top unshipped-revenue orders
    * for one segment.
    *
    * BROADCAST POLICY (applies to every query in this file): customer,
    * supplier and part scale LINEARLY with the corpus, so their joins
    * are UNHINTED — Spark broadcasts them while their (possibly
    * filtered) size fits under autoBroadcastJoinThreshold and AQE
    * falls back to a shuffle join when it doesn't. A forced
    * `broadcast()` hint on those tables would OOM at a billion
    * customers exactly when the size gate matters. Only genuinely
    * bounded frames keep the hint: nation/region (fixed-size dims at
    * every TPC-H SF), 1-row scalar aggregates, and literal band/window
    * tables. Fixture-scale plans are pinned broadcast in
    * PlanShapeSpec, so the unhinted joins can't silently regress to
    * SMJ at test SF.
    */
  def shippingPriority(li: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING"): DataFrame =
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q5 shape: revenue per nation for suppliers in one region
    * (4-way join; region/nation hinted — bounded dims at every SF —
    * supplier UNHINTED because it scales linearly: AQE size-gates its
    * broadcast; lineitem-orders shuffles).
    */
  def regionVolume(li: DataFrame, orders: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame, regionName: String = "ASIA"): DataFrame =
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)

  /** TPC-H Q10 shape: revenue lost to returned items per customer,
    * top 20. The fact side is FILTERED AT THE SCAN (l_returnflag = 'R'
    * reaches parquet as a pushed predicate), customer size-gated by AQE
    * and nation (hinted, bounded) broadcast,
    * and the top-20 is TakeOrderedAndProject after a map-side-combined
    * per-customer rollup — at 100 TB only returned line items ever
    * leave the scan stage.
    */
  def returnedRevenue(li: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame =
    li.filter(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** TPC-H Q12 shape: high/low-priority line counts per line status —
    * the conditional-aggregation join. One shuffle join on orderkey
    * (unhinted: orders is a quarter of lineitem's rows, AQE picks),
    * then a 2-row map-side-combined rollup; the CASE branches are
    * `count(when(...))` so both engines produce BIGINT.
    */
  def priorityLineCounts(li: DataFrame, orders: DataFrame): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q18 shape: large-volume orders (HAVING-subquery semi-join).
    * The qualifying-order set is a map-side-combinable per-order
    * rollup whose ~1% survivors broadcast back onto the fact join —
    * the aggregated-subquery pattern that stays cheap at 100 TB
    * because the filter reduces before anything wide happens.
    */
  def largeOrders(li: DataFrame, orders: DataFrame, customer: DataFrame,
      minQty: Double = 250.0): DataFrame = {
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("qty_sum"))
      .filter(col("qty_sum") > minQty)
      .select("l_orderkey")
    li.join(big, "l_orderkey")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_name", "o_orderkey", "o_totalprice")
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** TPC-H Q2 shape (the testdata has no partsupp, so lineitem is the
    * part-supplier bridge): for each ECONOMY part, the region's
    * suppliers who sold it at its region-wide MINIMUM price — the
    * correlated min-cost subquery, DECORRELATED the way it must run
    * at scale: the per-part min is one map-side-combined aggregate of
    * the region-filtered fact, joined back on (part, price=min)
    * instead of a per-row subquery. Dimensions broadcast; both the
    * eligible stream and the min table are per-part-sized at corpus
    * scale, so that join stays unhinted for AQE to pick (the q12/q18
    * policy). Ties (same part sold at the min by several suppliers)
    * surface as rows, exactly as in Q2.
    */
  def minCostSupplier(li: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame,
      regionName: String = "ASIA"): DataFrame = {
    val regionSupp = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("s_acctbal"))
    // per-part mins are independent across parts, so restricting to
    // the queried part type BEFORE the rollup is semantics-preserving
    // and prunes both fact passes (~6x here: one type of six) — the
    // filter would otherwise apply only after the min join-back
    val econParts = part.filter(col("p_type") === "ECONOMY")
    val eligible = li
      .join(econParts.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_extendedprice"), col("s_name"),
        col("n_name"), col("s_acctbal"))
    val minp = eligible.groupBy("l_partkey")
      .agg(min(col("l_extendedprice")).as("mp"))
      .withColumnRenamed("l_partkey", "mp_partkey")
    eligible
      .join(minp, col("l_partkey") === col("mp_partkey") &&
        col("l_extendedprice") === col("mp"))
      .join(econParts,
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        round(col("s_acctbal"), 2).as("acctbal"),
        round(col("mp"), 2).as("min_price"))
      .distinct()
      .orderBy(col("acctbal").desc, col("p_partkey").asc, col("s_name").asc)
      .limit(20)
  }

  def minCostSupplierOracle(regionName: String = "ASIA"): String =
    s"""WITH eligible AS (
       |  SELECT l_partkey, l_suppkey, l_extendedprice FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = '$regionName'),
       |minp AS (SELECT l_partkey, min(l_extendedprice) AS mp
       |  FROM eligible GROUP BY l_partkey)
       |SELECT DISTINCT p_partkey, p_name, s_name, n_name,
       |  round(s_acctbal, 2) AS acctbal, round(mp, 2) AS min_price
       |FROM eligible e
       |JOIN minp m ON e.l_partkey = m.l_partkey AND e.l_extendedprice = m.mp
       |JOIN part ON p_partkey = e.l_partkey
       |JOIN supplier ON s_suppkey = e.l_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_type = 'ECONOMY'
       |ORDER BY acctbal DESC, p_partkey ASC, s_name ASC LIMIT 20""".stripMargin

  /** TPC-H Q20 shape: the nested semi-join chain. A supplier
    * qualifies when, for some 'small%' part, their shipped volume
    * exceeds 20% of that part's total (the partsupp-availqty
    * threshold re-expressed over lineitem); qualifying suppliers
    * then semi-join the region's nations. Every membership test is a
    * LEFT SEMI join — nothing fans out, each stage only shrinks:
    * part-filter semi prunes the fact at the scan side, the
    * per-(supplier, part) rollup is map-side-combined against the
    * per-part totals, and the final supplier test carries only
    * supplier ids. Quantities are integral doubles, so the 0.2 *
    * total threshold compares exactly in both engines.
    */
  def qualifiedSuppliers(li: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "EUROPE", share: Double = 0.2): DataFrame = {
    val smallParts = part.filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val partTotal = li
      .join(smallParts, col("l_partkey") === col("p_partkey"), "leftsemi")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity")).as("tot"))
      .withColumnRenamed("l_partkey", "pt_partkey")
    val heavy = li
      .join(partTotal, col("l_partkey") === col("pt_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"), col("tot"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > col("tot") * share)
      .select(col("l_suppkey"))
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    supplier
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .join(broadcast(regionNations),
        col("s_nationkey") === col("n_nationkey"), "leftsemi")
      .select(col("s_suppkey"), col("s_name"),
        round(col("s_acctbal"), 2).as("acctbal"))
      .orderBy("s_suppkey")
  }

  def qualifiedSuppliersOracle(regionName: String = "EUROPE",
      share: Double = 0.2): String =
    s"""WITH part_total AS (
       |  SELECT l_partkey, sum(l_quantity) AS tot FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |                      WHERE p_name LIKE 'small%')
       |  GROUP BY l_partkey),
       |heavy AS (
       |  SELECT li.l_suppkey FROM lineitem li
       |  JOIN part_total pt ON li.l_partkey = pt.l_partkey
       |  GROUP BY li.l_suppkey, li.l_partkey, pt.tot
       |  HAVING sum(li.l_quantity) > $share * pt.tot)
       |SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
       |FROM supplier
       |WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
       |  AND s_nationkey IN (SELECT n_nationkey FROM nation
       |                      JOIN region ON n_regionkey = r_regionkey
       |                      WHERE r_name = '$regionName')
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q14 shape: promo revenue share — a conditional aggregate
    * ratio over the part join. The shipdate window is pushed to the
    * fact scan, part broadcasts, and the whole year reduces to ONE
    * row in a single map-side-combined aggregate (no regrouping: the
    * CASE lives inside the sum).
    */
  def promoRevenueShare(li: DataFrame, part: DataFrame,
      year: Int = 1997): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 4).as("promo_share"),
        count(lit(1)).as("n_lines"))
  }

  def promoRevenueShareOracle(year: Int = 1997): String =
    s"""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
       |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
       |    sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '$year-01-01'
       |  AND l_shipdate < TIMESTAMP '${year + 1}-01-01'""".stripMargin

  /** TPC-H Q19 shape: the disjunctive-predicate join — an OR of
    * (type, quantity-band, size-band) conjuncts that references BOTH
    * sides, so no single conjunct can be pushed below the join alone.
    * The join stays a plain broadcast equi-join on partkey with the
    * disjunction evaluated as a post-join filter — the plan that
    * scales, versus the naive per-disjunct union of three joins which
    * would scan the fact three times.
    */
  def disjunctiveBandRevenue(li: DataFrame, part: DataFrame): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val cond =
      (col("p_type") === "SMALL" && col("l_quantity").between(1, 11) &&
        col("p_size").between(1, 15)) ||
      (col("p_type") === "MEDIUM" && col("l_quantity").between(10, 20) &&
        col("p_size").between(1, 25)) ||
      (col("p_type") === "LARGE" && col("l_quantity").between(20, 30) &&
        col("p_size").between(1, 35))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(round(sum(rev), 2).as("revenue"), count(lit(1)).as("n_lines"))
  }

  def disjunctiveBandRevenueOracle: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_type = 'SMALL' AND l_quantity BETWEEN 1 AND 11
      |       AND p_size BETWEEN 1 AND 15)
      |   OR (p_type = 'MEDIUM' AND l_quantity BETWEEN 10 AND 20
      |       AND p_size BETWEEN 1 AND 25)
      |   OR (p_type = 'LARGE' AND l_quantity BETWEEN 20 AND 30
      |       AND p_size BETWEEN 1 AND 35)""".stripMargin

  /** TPC-H Q21 shape: suppliers who kept orders waiting — the
    * EXISTS + NOT-EXISTS pair over the same fact (no commit/receipt
    * dates in the testdata, so "late" is shipping >60 days after the
    * order date). ONE scan of the fact: conditional aggregation folds
    * each (order, supplier) pair to `max(l_shipdate)` (a pair is late
    * iff its LATEST line shipped late), the order lookup attaches the
    * status/date, and both EXISTS predicates become window counts over
    * the order — `n_supp > 1` (some other supplier exists) and
    * `n_late = 1` (no other late supplier). The window rides the join
    * exchange on `l_orderkey`, so the whole query is one full-fact
    * shuffle plus fixed-width pair frames, never correlated
    * row-at-a-time (vs the two-distinct form this replaces, which
    * scanned and shuffled the fact twice).
    */
  def waitingSuppliers(li: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 60): DataFrame = {
    val pairAgg = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
    // left join: a pair whose order is absent still counts toward the
    // EXISTS side (the oracle's `pairs` never touches orders)
    val flagged = pairAgg
      .join(orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"), "left")
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("o_orderstatus") === "F" && col("max_ship") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1L)
          .otherwise(0L).as("late"))
    val wOrd = Window.partitionBy("l_orderkey")
    flagged
      .withColumn("n_supp", count(lit(1)).over(wOrd))
      .withColumn("n_late", sum(col("late")).over(wOrd))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  def waitingSuppliersOracle(lateDays: Int = 60): String =
    s"""WITH late AS (
       |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'
       |    AND l_shipdate > o_orderdate + INTERVAL $lateDays DAY),
       |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
       |SELECT s_name, count(*) AS numwait
       |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
       |WHERE EXISTS (SELECT 1 FROM pairs l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM late l3
       |              WHERE l3.l_orderkey = l1.l_orderkey
       |                AND l3.l_suppkey <> l1.l_suppkey)
       |GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 10""".stripMargin

  /** TPC-H Q22 shape: high-balance customers gone quiet — a scalar
    * subquery threshold (average positive balance, rounded on both
    * engines before comparing) plus a LEFT ANTI join against recent
    * orders (the testdata's every customer has SOME order, so the
    * anti-join is against activity since `since` rather than
    * existence). The scalar enters as a broadcast 1-row cross join;
    * the anti join carries only custkeys.
    */
  def inactiveHighBalance(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, since: String = "2000-01-01"): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg(round(avg(col("c_acctbal")), 2).as("ab"))
    val recent = orders
      .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
      .select(col("o_custkey"))
    customer.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("n_name")
  }

  def inactiveHighBalanceOracle(since: String = "2000-01-01"): String =
    s"""WITH avg_bal AS (
       |  SELECT round(avg(c_acctbal), 2) AS ab FROM customer
       |  WHERE c_acctbal > 0)
       |SELECT n_name, count(*) AS numcust,
       |  round(sum(c_acctbal), 2) AS totacctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > (SELECT ab FROM avg_bal)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderdate >= TIMESTAMP '$since')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q6 shape: the pure scan-aggregate — every predicate
    * (shipdate window, discount band, quantity cap) reaches the
    * parquet scan as a pushed filter and the whole query is one
    * map-side-combined aggregate: no join, no wide exchange, the
    * cheapest possible 100 TB query and the benchmark's floor for
    * scan throughput.
    */
  def discountBandRevenue(li: DataFrame, year: Int = 1997): DataFrame =
    li.filter(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year + 1}-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))

  def discountBandRevenueOracle(year: Int = 1997): String =
    s"""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$year-01-01'
       |  AND l_shipdate < TIMESTAMP '${year + 1}-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q17 shape: the avg-quantity correlated subquery,
    * decorrelated as a per-part mean joined back. The mean is
    * sum/count of INTEGRAL quantities — both exact, so the division
    * and the 0.2x threshold compare identically across engines (the
    * parity rule: never threshold a non-integral float aggregate).
    * The brand's part list broadcasts and prunes BOTH fact passes
    * before the per-part rollup — at 100 TB only the brand's line
    * items are ever aggregated.
    */
  def smallQuantityRevenue(li: DataFrame, part: DataFrame,
      brand: String = "Brand#1"): DataFrame = {
    val brandParts = part.filter(col("p_brand") === brand)
      .select(col("p_partkey"))
    val brandLi = li
      .join(brandParts, col("l_partkey") === col("p_partkey"),
        "left_semi")
    val partAvg = brandLi.groupBy("l_partkey")
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    brandLi.join(partAvg, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  def smallQuantityRevenueOracle(brand: String = "Brand#1"): String =
    s"""WITH part_avg AS (
       |  SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part_avg USING (l_partkey)
       |JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = '$brand' AND l_quantity < 0.2 * avg_qty""".stripMargin

  /** TPC-H Q4 shape: orders with at least one late line item, counted
    * per priority — a correlated EXISTS whose predicate references
    * BOTH sides (l_shipdate vs o_orderdate + interval), planned as one
    * LEFT SEMI with the compound condition. The order-date window is
    * pushed to the orders scan; "late" adapts Q4's commit/receipt
    * comparison to the testdata's shipdate.
    */
  def latePriorityOrders(li: DataFrame, orders: DataFrame,
      lateDays: Int = 90): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  def latePriorityOrdersOracle(lateDays: Int = 90): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-04-01'
       |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
       |              AND l_shipdate > o_orderdate + INTERVAL $lateDays DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 shape: bilateral trade revenue between two nations per
    * ship year — the two-role dimension join (nation enters twice,
    * supplier-side and customer-side). Both nation copies are
    * PRE-FILTERED to the two trading nations before broadcasting, so
    * the fact stream shrinks at the first join; the pair condition
    * then only removes same-nation flows.
    */
  def nationTradeRevenue(li: DataFrame, supplier: DataFrame,
      nation: DataFrame, orders: DataFrame, customer: DataFrame,
      na: String = "NATION_1", nb: String = "NATION_2"): DataFrame = {
    val pair = nation.filter(col("n_name").isin(na, nb))
    val n1 = pair.select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val n2 = pair.select(col("n_nationkey").as("n2_key"),
      col("n_name").as("cust_nation"))
    li.join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("ship_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  def nationTradeRevenueOracle(na: String = "NATION_1",
      nb: String = "NATION_2"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate)::INT AS ship_year,
       |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = '$na' AND n2.n_name = '$nb')
       |   OR (n1.n_name = '$nb' AND n2.n_name = '$na')
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 shape: one nation's market share inside a region's
    * market for one part type, per order year — the conditional
    * revenue ratio over a six-table join. Part-type and region
    * filters prune their broadcast sides before the fact joins; the
    * share is a single conditional aggregate (no regrouping).
    */
  def nationMarketShare(li: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, orders: DataFrame,
      customer: DataFrame, region: DataFrame,
      regionName: String = "ASIA", partType: String = "ECONOMY",
      homeNation: String = "NATION_5"): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val marketNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("n2_key"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(part.filter(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(marketNations), col("c_nationkey") === col("n2_key"),
        "left_semi")
      .groupBy(year(col("o_orderdate")).cast("int").as("order_year"))
      .agg(round(sum(when(col("supp_nation") === homeNation, rev)
          .otherwise(lit(0.0))) / sum(rev), 4).as("mkt_share"))
      .orderBy("order_year")
  }

  def nationMarketShareOracle(regionName: String = "ASIA",
      partType: String = "ECONOMY", homeNation: String = "NATION_5"): String =
    s"""WITH flows AS (
       |  SELECT year(o_orderdate)::INT AS order_year,
       |    n1.n_name AS supp_nation,
       |    l_extendedprice * (1 - l_discount) AS rev
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  JOIN region ON n2.n_regionkey = r_regionkey
       |  WHERE r_name = '$regionName' AND p_type = '$partType')
       |SELECT order_year,
       |  round(sum(CASE WHEN supp_nation = '$homeNation' THEN rev
       |            ELSE 0 END) / sum(rev), 4) AS mkt_share
       |FROM flows GROUP BY order_year ORDER BY order_year""".stripMargin

  /** TPC-H Q13 shape: the customer order-count distribution INCLUDING
    * zero-order customers — a filtered LEFT OUTER join, a per-customer
    * count, then a count-of-counts histogram. The left join is what
    * keeps the zeros: an inner join would silently drop exactly the
    * customers the distribution's head is about.
    */
  def orderCountHistogram(customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val perCust = customer
      .join(orders.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
    perCust.groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_orders")
  }

  def orderCountHistogramOracle: String =
    """SELECT n_orders, count(*) AS n_customers FROM (
      |  SELECT c_custkey, count(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY n_orders ORDER BY n_orders""".stripMargin

  /** TPC-H Q15 shape: the top-revenue supplier — a scalar MAX
    * subquery matched back by equality. The per-supplier rollup is
    * map-side combined; the max enters as a broadcast 1-row cross
    * join and the equality match is within-engine (each engine
    * compares its own sums), so ties aside the pick is deterministic.
    */
  def topRevenueSupplier(li: DataFrame, supplier: DataFrame,
      since: String = "1998-01-01"): DataFrame = {
    // the max is matched back by EQUALITY, and the srev rollup runs
    // twice in the plan (probe side + max side) with independent
    // shuffle fetch orders — a double sum could differ in the last
    // bits between the two branches and match nothing. Sum exact
    // integer cents instead (associative, identical under any
    // aggregation order): the q9 fixed-point rule
    val revCents = round(col("l_extendedprice") *
      (lit(1) - col("l_discount")) * 100).cast("long")
    val srev = li
      .filter(col("l_shipdate") >= lit(since).cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(revCents).as("total_cents"))
    val maxRev = srev.agg(max(col("total_cents")).as("max_cents"))
    srev.crossJoin(broadcast(maxRev))
      .filter(col("total_cents") === col("max_cents"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("total_cents").cast("double") / lit(100.0))
          .as("total_revenue"))
      .orderBy("s_suppkey")
  }

  def topRevenueSupplierOracle(since: String = "1998-01-01"): String =
    s"""WITH srev AS (SELECT l_suppkey,
       |    sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
       |      AS total_cents
       |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '$since'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name,
       |  total_cents::DOUBLE / 100.0 AS total_revenue
       |FROM supplier JOIN srev ON s_suppkey = l_suppkey
       |WHERE total_cents = (SELECT max(total_cents) FROM srev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape: supplier counts per part attribute bucket with
    * an excluded-supplier set — NOT IN re-expressed as the LEFT ANTI
    * join it must become at scale (the excluded set is tiny and
    * broadcasts; suppkeys are never null, so the semantics match),
    * then a count-distinct rollup under a full-tiebreak top-20.
    */
  def partSupplierCounts(li: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame = {
    val excluded = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    li.join(excluded, col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(part.filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
      .limit(20)
  }

  def partSupplierCountsOracle: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 20""".stripMargin

  /** TPC-H Q9 shape: product-line profit by nation and year — the
    * multi-table arithmetic expression inside one aggregate (revenue
    * minus cost, where `0.6 * p_retailprice * l_quantity` stands in
    * for the missing partsupp supplycost). The part-name filter
    * prunes its broadcast side first, so at corpus scale only the
    * product line's rows flow through the four joins.
    */
  def nationProfit(li: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, orders: DataFrame,
      namePattern: String = "gear"): DataFrame = {
    // revenue-minus-cost terms CANCEL, so a double sum's fold-order
    // error can exceed the 2-decimal rounding grain (it did, on 1 of
    // 175 fixture groups) — quantize each row to exact integer cents
    // and sum those: integer addition is associative, so the total is
    // identical under any partial-aggregation order (the same
    // fixed-point rule the Lloyd centroid mean uses)
    val profitCents = round((col("l_extendedprice") *
      (lit(1) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")) * 100)
      .cast("long")
    li.join(part.filter(col("p_name").contains(namePattern)),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((sum(profitCents).cast("double") / lit(100.0)).as("profit"))
      .orderBy("nation", "o_year")
  }

  def nationProfitOracle(namePattern: String = "gear"): String =
    s"""SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       |  sum(round((l_extendedprice * (1 - l_discount)
       |    - 0.6 * p_retailprice * l_quantity) * 100)::BIGINT)::DOUBLE
       |    / 100.0 AS profit
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%$namePattern%'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TPC-H Q11 shape: value concentration — one nation's per-part
    * traded value (the availqty x supplycost stand-in) filtered by a
    * scalar threshold over the SAME rollup. TPC-H scales its fraction
    * by 1/SF; here the threshold is scale-free (2x the mean part
    * value) so the query is meaningful at every SF.
    *
    * Parity: per-part value is summed in EXACT INTEGER CENTS (the
    * q9/q15 fixed-point rule) — integer sums are associative under
    * any aggregation order, so the threshold cut can never land on a
    * fold-order-dependent half-cent boundary the way a rounded double
    * sum could. The mean is `exact long sum / exact count`, one double
    * division on both engines; the scalar enters as a broadcast 1-row
    * cross join.
    */
  def valueConcentration(li: DataFrame, supplier: DataFrame,
      nation: DataFrame, nationName: String = "NATION_3",
      multiple: Double = 2.0): DataFrame = {
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = li
      .join(natSupp, col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("vc"))
    val threshold = value
      .agg(round(lit(multiple) * avg(col("vc"))).cast("long").as("cut"))
    value.crossJoin(broadcast(threshold))
      .filter(col("vc") > col("cut"))
      .select(col("l_partkey"),
        (col("vc").cast("double") / 100.0).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey").asc)
  }

  def valueConcentrationOracle(nationName: String = "NATION_3",
      multiple: Double = 2.0): String =
    s"""WITH val AS (
       |  SELECT l_partkey, sum(round(l_extendedprice * 100)::BIGINT) AS vc
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = '$nationName'
       |  GROUP BY l_partkey)
       |SELECT l_partkey, vc::DOUBLE / 100.0 AS part_value
       |FROM val
       |WHERE vc > (SELECT round($multiple * avg(vc))::BIGINT FROM val)
       |ORDER BY part_value DESC, l_partkey ASC""".stripMargin

  /** Approximate aggregates (HLL cardinality, quantile sketch) — the
    * G3 approx surface. The sketches themselves are engine-specific
    * and can't hash-match a DuckDB run, so the query emits the EXACT
    * companions (cross-checkable) plus booleans asserting the sketch
    * landed within its error bound of the exact value. The booleans
    * oracle as constant `true`, so a sketch drifting out of bounds
    * flips the hash and fails the gate — the approx surface is
    * verified, not merely trusted.
    */
  def approxStats(li: DataFrame): DataFrame =
    li.agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 2)
          .as("median_price"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_median"))
      .select(
        col("exact_parts"),
        col("median_price"),
        // 0.02 rsd sketch: allow 3 standard errors (6%).
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * lit(0.06)).as("approx_parts_ok"),
        // accuracy=10000 quantile sketch on a continuous column: 1%.
        (abs(col("approx_median") - col("median_price")) <=
          col("median_price") * lit(0.01)).as("approx_median_ok"))

  /** Two-stage (salted) aggregation: the skewed-key mitigation for
    * aggregations — partials on (key, salt) first, so one hot key
    * spreads over `salt` reducers, then the tiny per-salt partials
    * re-aggregate. Semantics identical to the direct groupBy (the
    * oracle is the UNSALTED aggregation); sums re-sum and counts
    * re-sum losslessly.
    */
  def twoStageAgg(li: DataFrame, salt: Int = 16): DataFrame =
    li.groupBy(col("l_returnflag"),
        pmod(xxhash64(col("l_orderkey")), lit(salt)).as("salt"))
      .agg(sum(col("l_quantity")).as("partial_qty"),
        count(lit(1)).as("partial_n"))
      .groupBy("l_returnflag")
      .agg(round(sum("partial_qty"), 2).as("total_qty"),
        sum("partial_n").as("n"))
      .orderBy("l_returnflag")

  /** Irregular price bands for [[rangeJoinPriceBands]]: (name, lo, hi),
    * half-open [lo, hi). Shared with the oracle generator.
    */
  val PriceBands: Seq[(String, Long, Long)] = Seq(
    ("a_low", 0L, 75000L), ("b_mid", 75000L, 180000L),
    ("c_high", 180000L, 320000L), ("d_lux", 320000L, 1000000L))

  /** J4 range join: orders binned into irregular price bands via a
    * non-equi `lo <= price < hi` join.
    *
    * Scale posture: the band side is tiny and broadcast, so this is a
    * broadcast nested-loop over O(bands) comparisons per row — no
    * shuffle of the fact side at all. (For range joins where BOTH
    * sides are large, the scale plan is bin-bucketing: overlap each
    * range onto fixed-width bins and equi-join on bin id first.)
    */
  def rangeJoinPriceBands(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val bands = PriceBands.toDF("band", "lo", "hi")
    orders.join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("band")
  }

  def rangeJoinOracle: String = {
    val vals = PriceBands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }
      .mkString(", ")
    s"""SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
       |FROM orders JOIN (VALUES $vals) AS bands(band, lo, hi)
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY band ORDER BY band""".stripMargin
  }

  /** Promotion windows for [[overlapJoinPromos]]: (name, start, end)
    * date literals, half-open [start, end).
    */
  val PromoWindows: Seq[(String, String, String)] = Seq(
    ("w1_95h2", "1995-07-01", "1996-01-01"),
    ("w2_96", "1996-01-01", "1997-01-01"),
    ("w3_97q1", "1997-01-01", "1997-04-01"))

  /** J4 interval-OVERLAP join (range-range, not point-range): each
    * order's 90-day fulfilment interval joined to every promotion
    * window it overlaps. Windows broadcast; the fact side streams.
    * With two LARGE interval sets the scale plan is bin-overlap: emit
    * one row per fixed-width bin an interval touches, equi-join on bin
    * id, then re-check the exact overlap predicate.
    */
  def overlapJoinPromos(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val windows = PromoWindows.toDF("w_name", "w_start", "w_end")
      .select(col("w_name"), col("w_start").cast("date").as("ws"),
        col("w_end").cast("date").as("we"))
    val d = col("o_orderdate").cast("date")
    orders.select(col("o_orderkey"), d.as("o_start"),
        date_add(d, 90).as("o_end"))
      .join(broadcast(windows),
        col("o_start") < col("we") && col("ws") <= col("o_end"))
      .groupBy("w_name")
      .agg(count(lit(1)).as("n_overlapping"))
      .orderBy("w_name")
  }

  def overlapJoinOracle: String = {
    val vals = PromoWindows.map { case (n, s, e) =>
      s"('$n', DATE '$s', DATE '$e')"
    }.mkString(", ")
    s"""SELECT w_name, count(*) AS n_overlapping
       |FROM orders JOIN (VALUES $vals) AS w(w_name, ws, we)
       |  ON o_orderdate::DATE < we AND ws <= o_orderdate::DATE + 90
       |GROUP BY w_name ORDER BY w_name""".stripMargin
  }

  /** Correlated LATERAL subquery through the SQL surface: the top-2
    * orders per customer for a deterministic customer subset. Catalyst
    * decorrelates the per-row ORDER BY + LIMIT into a ranked window —
    * one shuffle, no per-customer re-scan.
    */
  def sqlLateral(spark: SparkSession, sfDir: String): DataFrame = {
    T(spark, sfDir, "customer").createOrReplaceTempView("customer")
    T(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2)
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** G3: CUBE over (returnflag, linestatus) — all four grouping-set
    * combinations with coalesced 'ALL' labels.
    */
  def cubeAgg(li: DataFrame): DataFrame =
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("qty"))
      .orderBy("flag", "status")

  /** G3: explicit GROUPING SETS — per-status, per-priority, and grand
    * total in one pass (one shuffle, expanded map-side).
    */
  def groupingSetsAgg(orders: DataFrame): DataFrame =
    orders.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")
}

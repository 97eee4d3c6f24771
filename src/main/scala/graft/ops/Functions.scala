package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-function operators — SURVEY.md §2.B F-series. All built-in
  * codegen'd expressions; zero UDFs. Each mirrors a concrete reference
  * transformation (citations inline).
  */
object Functions {

  /** F1/F5: split + explode, one row per piece
    * (basic_tasks.py:32-40, tests/test2.py:20-27).
    */
  def splitExplode(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .orderBy("doc_id", "word")

  /** F2: tokenize with the stable pre-explode row id kept
    * (basic_tasks.py:54-66; doc_id plays `sample_ind`).
    */
  def tokenizeWithId(docs: DataFrame): DataFrame =
    Text.tokenize(docs).orderBy("doc_id", "token")

  /** F3: strip edge non-word chars (basic_tasks.py:73-79) — shown on a
    * deliberately dirtied input so the strip is observable.
    */
  def cleanEdges(part: DataFrame): DataFrame =
    part.select(col("p_partkey"),
        regexp_replace(concat(lit("  "), col("p_brand"), lit("##")),
          "^\\W+|\\W+$", "").as("cleaned"))
      .orderBy("p_partkey")

  /** F4: remove digits (tests/test2.py:9-17). */
  def removeDigits(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        regexp_replace(col("c_name"), "\\d", "").as("name_alpha"))
      .orderBy("c_custkey")

  /** F6: string concatenation col+col and lit+col (tests/test.py:5-21). */
  def concatCols(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tagged"),
        concat(lit("hello "), col("c_name")).as("greeted"))
      .orderBy("c_custkey")

  /** F7: casts (basic_tasks.py:38, serve_view_df.py:139). Long->string
    * and digit-string->long; double->int is avoided because DuckDB
    * rounds while Spark truncates.
    */
  def casts(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        col("c_custkey").cast("string").as("key_str"),
        regexp_replace(col("c_name"), "\\D", "").cast("long").as("name_num"))
      .orderBy("c_custkey")

  /** F8: scalar arithmetic (basic_tasks.py:100). Left unrounded:
    * single-row IEEE products evaluate bit-identically in any engine,
    * whereas rounding at a half-boundary does not.
    */
  def arithmetic(li: DataFrame): DataFrame =
    li.select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("charge"),
        (col("l_linenumber") * 2 + 1).as("odd_line"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F9: display truncation (serve_view_df.py:132-139, colwidth 30). */
  def truncateDisplay(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        when(length(col("text")) > 30,
          concat(substring(col("text"), 1, 30), lit("...")))
          .otherwise(col("text")).as("display"))
      .orderBy("doc_id")

  /** F10: date/time — orders per month (month emitted as a string:
    * date dtypes round-trip differently through parquet/pandas than
    * strings do, and the compare is value-based).
    */
  def ordersPerMonth(orders: DataFrame): DataFrame =
    orders.select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_totalprice"))
      .groupBy("month")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("month")

  /** F10: date arithmetic — order age in days from a fixed epoch and
    * extraction of calendar parts.
    */
  def dateArithmetic(orders: DataFrame): DataFrame =
    orders.select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).as("days_since_95"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"))
      .orderBy("o_orderkey")

  /** F10: array functions over the token array — size, membership,
    * distinct-sort-slice-join.
    */
  def arrayFunctions(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(toks).as("n_toks"),
        array_contains(toks, "the").as("has_the"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), "-")
          .as("first3"))
      .orderBy("doc_id")
  }

  /** Null-handling surface: nullif / coalesce / greatest / least /
    * conditional.
    */
  def nullFunctions(li: DataFrame): DataFrame =
    li.select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("flag_filled"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        when(col("l_discount") > 0.05, "deep").otherwise("shallow")
          .as("discount_band"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Union-by-name with missing columns (null-filled): the schema
    * evolution form of union.
    */
  def unionByNameEntities(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.select(col("c_custkey").as("id"), col("c_name").as("name"))
    val s = supplier.select(col("s_suppkey").as("id"), col("s_name").as("name"),
      col("s_acctbal").as("bal"))
    c.unionByName(s, allowMissingColumns = true)
      .orderBy("id", "name")
  }

  /** Regex capture extraction (group 1). */
  def regexpExtract(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        regexp_extract(col("c_name"), "(\\d+)", 1).as("digits"))
      .orderBy("c_custkey")

  /** F10: JSON extraction — sum of props.k per event type. */
  def jsonAgg(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_total"))
      .orderBy("event_type")

  /** F10: map functions — parse the JSON props into a
    * `map<string,string>`, inspect its keys, extract a value, and
    * extend it with `map`/`map_concat`. All codegen'd built-ins.
    */
  def mapFunctions(events: DataFrame): DataFrame = {
    val m = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
    events.select(col("event_id"),
        array_join(array_sort(map_keys(m)), ",").as("keys_str"),
        element_at(m, "k").cast("long").as("k_val"),
        size(map_concat(m, map(lit("src"), col("event_type")))).as("n_keys"))
      .orderBy("event_id")
  }

  /** F10: struct functions — build an array of (len, tok) structs per
    * document, sort it by the struct's natural (lexicographic-by-field)
    * order, and take the maximum element. Struct comparison semantics
    * match DuckDB's `struct_pack` + `list_sort`.
    */
  def structFunctions(docs: DataFrame): DataFrame = {
    val structs = transform(split(col("text"), " "),
      t => struct(length(t).as("len"), t.as("tok")))
    val mx = element_at(array_sort(structs), -1)
    docs.select(col("doc_id"),
        mx.getField("len").as("max_len"),
        mx.getField("tok").as("max_tok"))
      .orderBy("doc_id")
  }

  /** F1 variant: `explode_outer` — rows whose array is empty survive
    * with a NULL element (plain explode drops them).
    */
  def explodeOuter(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode_outer(filter(split(col("text"), " "), w => w === "window"))
          .as("w"))
      .orderBy(col("doc_id"), coalesce(col("w"), lit("")))

  /** F10: higher-order array functions — filter / exists / forall /
    * transform+aggregate / zip_with in one projection.
    */
  def higherOrderFunctions(docs: DataFrame): DataFrame = {
    // project the split once — unaliased, CollapseProject would
    // re-evaluate it inside all five signals
    val toks = col("toks")
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(filter(toks, w => length(w) > 4)).as("n_long"),
        exists(toks, w => w === "sort").as("has_sort"),
        forall(toks, w => length(w) < 10).as("all_short"),
        aggregate(transform(toks, w => length(w).cast("long")), lit(0L),
          (acc, x) => acc + x).as("sum_len"),
        size(filter(zip_with(toks, reverse(toks), (a, b) => a === b),
          x => x)).as("n_sym"))
      .orderBy("doc_id")
  }

  /** ANSI-safe `try_*` family: failures yield NULL instead of throwing
    * (Spark 4 runs ANSI mode, where plain cast/arithmetic errors).
    */
  def tryFunctions(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        col("c_name").try_cast("bigint").as("name_num"),
        try_divide(col("c_acctbal"), (col("c_custkey") % 3).cast("double"))
          .as("bal_div"),
        try_add(lit(Long.MaxValue), when(col("c_custkey") > 0, 1L)
          .otherwise(0L)).as("overflow_add"))
      .orderBy("c_custkey")

  /** Edit-distance surface: levenshtein against derived strings. */
  def fuzzyDistance(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
        levenshtein(col("c_name"),
          regexp_replace(col("c_name"), "\\d", "")).as("lev_digits"),
        levenshtein(lower(col("c_mktsegment")), lit("building"))
          .as("lev_building"))
      .orderBy("c_custkey")

  /** Row-level bitwise surface: and/or/xor/shifts/bit_count over the
    * key columns.
    */
  def bitwiseFunctions(li: DataFrame): DataFrame =
    li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("and255"),
        col("l_orderkey").bitwiseOR(col("l_linenumber")).as("or_line"),
        col("l_orderkey").bitwiseXOR(col("l_linenumber")).as("xor_line"),
        shiftleft(col("l_linenumber"), 4).as("line_shl4"),
        shiftright(col("l_orderkey"), 2).as("key_shr2"),
        bit_count(col("l_orderkey")).as("key_bits"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F10: VARIANT (semi-structured) surface — parse the JSON props
    * once into a variant and extract typed fields from it. Variant is
    * the open-schema scale path: one parse, many typed reads, no
    * per-field re-parsing of the JSON text.
    */
  def variantExtract(events: DataFrame): DataFrame = {
    val v = parse_json(col("props"))
    events.select(col("event_id"),
        variant_get(v, "$.k", "bigint").as("k_val"),
        variant_get(v, "$.k", "string").as("k_str"))
      .orderBy("event_id")
  }

  /** F10: interval / calendar arithmetic — add months and days, week
    * truncation, month end, day-of-year. Dates emitted as strings (the
    * compare is value-based; date dtypes round-trip differently).
    */
  def intervalArithmetic(orders: DataFrame): DataFrame = {
    val d = col("o_orderdate").cast("date")
    orders.select(col("o_orderkey"),
        date_format(add_months(d, 3), "yyyy-MM-dd").as("plus_3_months"),
        date_format(date_add(d, 90), "yyyy-MM-dd").as("plus_90_days"),
        date_format(date_trunc("week", d), "yyyy-MM-dd").as("week_start"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
        dayofyear(d).as("doy"))
      .orderBy("o_orderkey")
  }
}

package graft.planner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Demo task library — the reference's `basic_tasks.py` pipeline
  * re-expressed as planner tasks over lazy DataFrames, with the same
  * dot-namespaced lineage columns (`text` -> `text.tokens` ->
  * `text.tokens.cnt` -> `text.tokens.top90`).
  *
  * Task bodies name their outputs from `expects` (the planner's
  * expanded templates), so one generic body serves every lineage the
  * unifier binds it to — the reference's central trick
  * (basic_tasks.py:34-40 et al.), minus the eager execution.
  */
object Library {

  private def bq(name: String) = s"`${name.replace("`", "``")}`"

  /** `splitter` (tests/test2.py:20-27): space-split + explode any
    * column `{x}` into `{x}.split`.
    */
  val splitter: Task = Task(
    name = "splitter",
    requires = Vector(Req("x", Vector(Pat("(.+)")))),
    makes = Vector(Vector("{x}.split")))(
    in => {
      val src = in.bindings("x").cols.head.column
      val out = in.expects.head.head
      Seq(in.frames("x")
        .select(explode(split(col(bq(src)).cast("string"), " ")).as(out)))
    })

  /** `remove_num` (tests/test2.py:9-17): strip digits from `{x}` into
    * `{x}.alpha`.
    */
  val removeNum: Task = Task(
    name = "remove_num",
    requires = Vector(Req("x", Vector(Pat("(.+)")))),
    makes = Vector(Vector("{x}.alpha")))(
    in => {
      val src = in.bindings("x").cols.head.column
      val out = in.expects.head.head
      Seq(in.frames("x")
        .select(regexp_replace(col(bq(src)).cast("string"), "\\d", "").as(out)))
    })

  /** Tokenize a `*text*` column next to its `doc_id`
    * (basic_tasks.py:54-79 composed: split/explode/lower/clean/len>1).
    */
  val tokenize: Task = Task(
    name = "tokenize",
    requires = Vector(Req("docs", Vector(Lit("doc_id"), Pat("(text)")))),
    makes = Vector(Vector("doc_id", "{docs.1}.tokens")))(
    in => {
      val src = in.bindings("docs").cols(1).column
      val out = in.expects.head(1)
      Seq(in.frames("docs")
        .select(col("doc_id"),
          explode(split(lower(col(bq(src))), "\\W+")).as(out))
        .filter(length(col(bq(out))) > 1))
    })

  /** value_counts over a `.tokens` column (basic_tasks.py:82-89). */
  val counts: Task = Task(
    name = "counts",
    requires = Vector(Req("t", Vector(Pat(raw"(.+)\.tokens")))),
    makes = Vector(Vector("{t}", "{t}.cnt")))(
    in => {
      val src = in.bindings("t").cols.head.column
      val cntCol = in.expects.head(1)
      Seq(in.frames("t")
        .groupBy(col(bq(src)))
        .agg(count(lit(1)).as(cntCol)))
    })

  /** Top-p mass cut over a (tokens, tokens.cnt) frame
    * (basic_tasks.py:92-105).
    */
  val top90: Task = Task(
    name = "top90",
    requires = Vector(Req("c",
      Vector(Pat(raw"(.+)\.tokens"), Pat(raw"(.+)\.tokens\.cnt")))),
    makes = Vector(Vector("{c.0.0}.top90", "{c.1.0}")))(
    in => {
      val tokCol = in.bindings("c").cols(0).column
      val cntCol = in.bindings("c").cols(1).column
      val outTok = in.expects.head.head
      val counts = in.frames("c")
      // the scale-safe two-stage prefix sum (never a single-partition
      // vocabulary sort) — same core as Text.topPTokens
      Seq(graft.ops.Text
        .topPMassCut(counts, col(bq(tokCol)), col(bq(cntCol)), 0.9)
        .select(col("__key").as(outTok), col("__cnt").as(cntCol)))
    })

  /** Exact content dedup as a planner task — the north-star extension
    * ops register exactly like the reference-shaped ones, so goals
    * can compose them (`text.canonical_id` is reachable from any
    * (doc_id, text) frame).
    */
  val dedupExact: Task = Task(
    name = "dedup_exact",
    requires = Vector(Req("docs", Vector(Lit("doc_id"), Pat("(text)")))),
    makes = Vector(Vector("{docs.1}.canonical_id", "{docs.1}.n_copies")))(
    in => {
      val txt = in.bindings("docs").cols(1).column
      val outCanon = in.expects.head(0)
      val outN = in.expects.head(1)
      Seq(in.frames("docs")
        .groupBy(graft.ops.H.hash60(col(bq(txt))))
        .agg(min(col("doc_id")).as(outCanon), count(lit(1)).as(outN))
        .select(col(bq(outCanon)), col(bq(outN))))
    })

  /** The registry used by the planner demos. */
  val registry: TaskRegistry =
    TaskRegistry.of(splitter, removeNum, tokenize, counts, top90, dedupExact)

  // ------------------------------------------------------------ demos

  /** tests/test2.py end-to-end: literal frame, goal `name.split.alpha`
    * (expected rows: sankho / turjo / sarkar).
    */
  def test2Pipeline(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val pool = Executor.run(
      TaskRegistry.of(splitter, removeNum),
      Seq(source),
      Vector(Vector("name.split.alpha")))
    pool.last.select(col(bq("name.split.alpha")).as("alpha_token"))
      .orderBy("alpha_token")
  }

  /** Exact dedup, but PLANNED: BFS reaches `text.canonical_id` from
    * the (doc_id, text) corpus via the registered dedup task. Fixture
    * matches `ns_dedup_exact` (a copy of every doc at id + 1e6), so it
    * shares that oracle.
    */
  def plannedDedup(docs: DataFrame): DataFrame = {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text")))
    val pool = Executor.run(
      registry,
      Seq(corpus),
      Vector(Vector("text.canonical_id", "text.n_copies")))
    pool.last
      .select(col(bq("text.canonical_id")).as("canonical_id"),
        col(bq("text.n_copies")).as("n_copies"))
      .orderBy("canonical_id")
  }

  /** The usenet-shaped flagship, but PLANNED: BFS composes
    * tokenize -> counts -> top90 from the goal column name alone, and
    * the result must equal the hand-built Text.topPTokens plan.
    */
  def plannedTop90(docs: DataFrame): DataFrame = {
    val pool = Executor.run(
      registry,
      Seq(docs.select("doc_id", "text")),
      Vector(Vector("text.tokens.top90")))
    pool.last
      .select(col(bq("text.tokens.top90")).as("token"),
        col(bq("text.tokens.cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
  }
}

package graft.planner

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Execution-layer tests: planned pipelines produce the right data,
  * append-join honors its contract, and the planned flagship equals
  * the hand-built plan.
  */
class ExecutorSpec extends SparkSpec {

  test("test2.py pipeline: plan + execute to expected literal rows") {
    val got = Library.test2Pipeline(spark).collect().map(_.getString(0))
    assert(got.toSeq == Seq("sankho", "sarkar", "turjo"))
  }

  test("planned top90 equals the hand-built flagship plan") {
    val docs = graft.ops.T(spark, sf, "documents")
    val planned = Library.plannedTop90(docs).collect()
    val manual = graft.ops.Text.topPTokens(docs, 0.9).collect()
    assert(planned.toSeq == manual.toSeq)
  }

  test("append-join carries non-required input columns onto the output") {
    import spark.implicits._
    val src = Seq(("k1", "x1", "m1"), ("k2", "x2", "m2"))
      .toDF("key", "other", "meta")
    val enrich = Task("enrich",
      Vector(Req.lit("x", "key")),
      Vector(Vector("key", "derived")), appends = true)(
      in => Seq(in.frames("x").select(col("key"),
        concat(col("key"), lit("_d")).as("derived"))))
    val pool = Executor.run(TaskRegistry.of(enrich), Seq(src),
      Vector(Vector("derived", "meta")))
    val out = pool.last
    assert(out.columns.toSet == Set("key", "derived", "other", "meta"))
    val rows = out.orderBy("key").collect()
    assert(rows.map(_.getAs[String]("derived")).toSeq == Seq("k1_d", "k2_d"))
    assert(rows.map(_.getAs[String]("meta")).toSeq == Seq("m1", "m2"))
  }

  test("missing declared output column is a hard error") {
    import spark.implicits._
    val src = Seq(("a")).toDF("A")
    val lying = Task("lying", Vector(Req.lit("x", "A")),
      Vector(Vector("B")))(
      in => Seq(in.frames("x"))) // returns A, declared B
    val ex = intercept[IllegalArgumentException] {
      Executor.run(TaskRegistry.of(lying), Seq(src), Vector(Vector("B")))
    }
    assert(ex.getMessage.contains("missing declared columns"))
  }

  test("unplannable goal raises Path not found") {
    import spark.implicits._
    val src = Seq(("a")).toDF("A")
    val ex = intercept[RuntimeException] {
      Executor.run(TaskRegistry.of(Library.splitter), Seq(src),
        Vector(Vector("nope")))
    }
    assert(ex.getMessage == "Path not found")
  }
}

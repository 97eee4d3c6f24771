package graft.planner

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Drives [[Browse]] the way a user would drive the reference's web
  * browser (serve.py:110-147): list steps, pick one, inspect, repeat —
  * reproducing tests/test2.py's pipeline one click at a time.
  */
class BrowseSpec extends SparkSpec {

  private def reg = TaskRegistry.of(Library.splitter, Library.removeNum)

  test("interactive browse walks tests/test2.py's plan step by step") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    var s = Browse.open(reg, Seq(source))

    val a0 = Browse.actions(s)
    val split = a0.indexWhere(_.outputs == Vector(Vector("name.split")))
    assert(split >= 0, a0.map(Browse.describe))
    s = Browse.step(s, split)

    val a1 = Browse.actions(s)
    val alpha = a1.indexWhere(_.outputs == Vector(Vector("name.split.alpha")))
    assert(alpha >= 0, a1.map(Browse.describe))
    s = Browse.step(s, alpha)

    val got = s.pool.last.select(col("`name.split.alpha`"))
      .collect().map(_.getString(0)).sorted
    assert(got.sameElements(Array("sankho", "sarkar", "turjo")), got.toSeq)

    // the browsed path serializes + replays like any planned path
    val json = PlanJson.toJson(s.path)
    assert(PlanJson.fromJson(reg, json) == s.path)

    // preview pages the newest frame under a stable order
    assert(Browse.preview(s, 0).collect().length == 3)
    assert(Browse.preview(s, 1).collect().isEmpty)

    // the distributed part plans as top-k (TakeOrderedAndProject:
    // per-partition local top-k, driver merge), never a global Window
    // funneling the frame through one partition
    val plan = Browse.previewTop(s.pool.last, 0, Browse.PageSize)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("the command surface lists, applies, and dumps the plan") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val s0 = Browse.open(reg, Seq(source))

    val (_, listed) = Browse.command(s0, "")
    assert(listed.exists(_.contains("frame #0: (index, name)")), listed)
    assert(listed.exists(_.contains("splitter")), listed)

    val split = Browse.actions(s0)
      .indexWhere(_.outputs == Vector(Vector("name.split")))
    val (s1, out1) = Browse.command(s0, split.toString)
    assert(out1.exists(_.startsWith("applied: splitter")), out1)

    val (_, planOut) = Browse.command(s1, "plan")
    assert(planOut.head.contains("\"task\":\"splitter\""), planOut)
  }

  test("the goal command plans and applies a full path from mid-state") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val s0 = Browse.open(reg, Seq(source))
    val (s1, out) = Browse.command(s0, "goal name.split.alpha")
    assert(out.exists(_.startsWith("planned 2 steps: splitter -> remove_num")),
      out)
    val got = s1.pool.last.select(col("`name.split.alpha`"))
      .collect().map(_.getString(0)).sorted
    assert(got.sameElements(Array("sankho", "sarkar", "turjo")))
    val (_, unreachable) = Browse.command(s1, "goal no.such.column")
    assert(unreachable.exists(_.contains("unreachable")))
  }
}

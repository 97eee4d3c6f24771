package graft.planner

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Plan serialization round-trip + property tests for the template/
  * unify layer (the reference's only-partially-working test surface,
  * SURVEY.md §5, hardened with generators).
  */
class PlanJsonSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("plan JSON round-trips and replays to the same result") {
    import spark.implicits._
    val source = Seq((0L, "sankho123 turjo sarkar456")).toDF("index", "name")
    val reg = TaskRegistry.of(Library.splitter, Library.removeNum)
    val path = Planner.findPath(reg,
      Vector(Vector("index", "name")), Vector(Vector("name.split.alpha"))).get

    val json = PlanJson.toJson(path)
    val back = PlanJson.fromJson(reg, json)
    assert(back.map(_.task.name) == path.map(_.task.name))
    assert(back.map(_.bindings) == path.map(_.bindings))
    assert(back.map(_.outputs) == path.map(_.outputs))

    val a = Executor.runPath(Seq(source), path).last.collect().toSeq
    val b = Executor.runPath(Seq(source), back).last.collect().toSeq
    assert(a == b)
    // key is stable across serializations
    assert(PlanJson.planKey(path) == PlanJson.planKey(back))
  }

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("property: literal variables match exactly themselves") {
    check(Prop.forAll(nameGen, nameGen) { (a, b) =>
      val m = Lit(a).matches(b)
      if (a == b) m.contains(Vector(a)) else m.isEmpty
    })
  }

  test("property: (.+) suffix pattern captures the prefix") {
    check(Prop.forAll(nameGen, nameGen) { (base, suffix) =>
      Pat(raw"(.+)\." + java.util.regex.Pattern.quote(suffix))
        .matches(s"$base.$suffix")
        .exists(g => g(1).nonEmpty && (g(1) + "." + suffix) == g(0))
    })
  }

  test("property: template expand of {x} equals the bound column") {
    check(Prop.forAll(nameGen, nameGen) { (colName, tail) =>
      val b = Map("x" -> Binding(0, Vector(ColMatch(colName, Vector(colName)))))
      Template.expand(s"{x}.$tail", b) == s"$colName.$tail"
    })
  }

  test("property: a found path, symbolically applied, reaches the goal") {
    val depthGen = Gen.choose(1, 6)
    check(Prop.forAll(depthGen) { depth =>
      val chain = (1 to depth).map { i =>
        val from = if (i == 1) raw"(src)$$" else raw"(.+)\.s${i - 1}$$"
        Task(s"step$i", Vector(Req("x", Vector(Pat(from)))),
          Vector(Vector(s"{x}.s$i")))(_ => Seq(null))
      }
      val reg = TaskRegistry(chain.toVector)
      val goal = Vector(Vector("src" + (1 to depth).map(i => s".s$i").mkString))
      Planner.findPath(reg, Vector(Vector("src")), goal).exists { path =>
        val end = path.foldLeft(Planner.initial(Vector(Vector("src"))))(
          Planner.apply)
        path.length == depth && Planner.goalReached(end, goal)
      }
    })
  }

  test("property: A* agrees with BFS (same reachability, same length)") {
    val depthGen = Gen.choose(1, 6)
    val distractGen = Gen.choose(0, 4)
    check(Prop.forAll(depthGen, distractGen) { (depth, nDead) =>
      val chain = (1 to depth).map { i =>
        val from = if (i == 1) raw"(src)$$" else raw"(.+)\.s${i - 1}$$"
        Task(s"step$i", Vector(Req("x", Vector(Pat(from)))),
          Vector(Vector(s"{x}.s$i")))(_ => Seq(null))
      }
      val dead = (1 to nDead).map(i =>
        Task(s"dead$i", Vector(Req("x", Vector(Lit(s"missing$i")))),
          Vector(Vector(s"never$i")))(_ => Seq(null)))
      val reg = TaskRegistry((chain ++ dead).toVector)
      val goal = Vector(Vector("src" + (1 to depth).map(i => s".s$i").mkString))
      // findPath delegates to A* since round 7 — the exhaustive
      // baseline must be the explicit BFS, or this compares A* to A*
      val (bfs, bfsExp) =
        Planner.findPathBfsCounted(reg, Vector(Vector("src")), goal)
      val (astar, aExp) =
        Planner.findPathAStarCounted(reg, Vector(Vector("src")), goal)
      bfs.isDefined == astar.isDefined &&
        bfs.map(_.length) == astar.map(_.length) &&
        aExp <= bfsExp &&
        astar.forall { path =>
          Planner.goalReached(
            path.foldLeft(Planner.initial(Vector(Vector("src"))))(Planner.apply),
            goal)
        }
    })
  }

  test("property: A* plan length is optimal on RANDOM literal registries (round-11)") {
    // the chain property above fixes the registry SHAPE; this one
    // draws arbitrary literal-task DAGs (random in/out column sets,
    // random sources) so a future heuristic change can't overfit the
    // chain. Contract pinned exactly as documented on findPathAStar:
    //  - reachability always agrees with BFS;
    //  - A* can never beat exhaustive BFS (BFS is minimal);
    //  - single-goal-set goals: h <= 1 is admissible -> length EQUAL;
    //  - multi-set goals: one frame may cover several sets at once ->
    //    at most (goalSets - 1) steps off minimal.
    val cols = (0 until 6).map(i => s"c$i").toVector
    val colGen = Gen.oneOf(cols)
    val frameGen = Gen.choose(1, 2).flatMap(n =>
      Gen.listOfN(n, colGen).map(_.distinct.toVector))
    val taskGen = for {
      ins <- frameGen
      outs <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, frameGen))
    } yield (ins, outs.toVector)
    val regGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, taskGen))
    val goalGen = Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, frameGen))
    check(Prop.forAll(regGen, frameGen, goalGen) { (specs, src, goalSets) =>
      val reg = TaskRegistry(specs.zipWithIndex.map { case ((ins, outs), i) =>
        Task(s"t$i", Vector(Req.lit("x", ins: _*)), outs)(_ => Seq(null))
      }.toVector)
      val goal = goalSets.toVector
      val (bfs, _) = Planner.findPathBfsCounted(reg, Vector(src), goal)
      val (astar, _) = Planner.findPathAStarCounted(reg, Vector(src), goal)
      val reachAgree = bfs.isDefined == astar.isDefined
      val lengthOk = (bfs, astar) match {
        case (Some(b), Some(a)) =>
          a.length >= b.length &&
            (if (goal.size == 1) a.length == b.length
             else a.length <= b.length + goal.size - 1)
        case _ => true
      }
      val goalOk = astar.forall { path =>
        Planner.goalReached(
          path.foldLeft(Planner.initial(Vector(src)))(Planner.apply), goal)
      }
      reachAgree && lengthOk && goalOk
    })
  }

  test("property: every satisfied binding actually matches its columns") {
    val varGen: Gen[Variable] = Gen.oneOf(
      nameGen.map(Lit(_)),
      Gen.const(Pat("(.+)")),
      Gen.const(Pat(raw"(\w+)x")))
    val frameGen: Gen[Vector[String]] =
      Gen.nonEmptyListOf(nameGen).map(_.toVector.distinct)
    check(Prop.forAll(varGen, frameGen) { (v, frame) =>
      val t = Task("t", Vector(Req("x", Vector(v))),
        Vector(Vector("out")))(_ => Seq(null))
      Unify.satisfy(t, Vector(frame)).forall { c =>
        c.bindings("x").cols.forall(cm =>
          frame.contains(cm.column) && v.matches(cm.column).isDefined)
      }
    })
  }
}

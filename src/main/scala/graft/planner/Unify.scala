package graft.planner

/** Requirement unification — the reference's `TaskCaller.satisfy`
  * (SURVEY.md §2.A A2/A3; /root/reference/frame_tasks/tasks.py:293-418)
  * as a pure recursive search.
  *
  * Given the column sets of available frames, enumerate every way a
  * task's requirements can bind:
  *  - each requirement's variables all bind within ONE frame
  *    (tasks.py:336-339);
  *  - concrete requirements bind before dynamic (`{...}`-templated)
  *    ones, whose literal is expanded from earlier bindings
  *    (tasks.py:306-317);
  *  - every combination is produced lazily (backtracking generator,
  *    tasks.py:354-368).
  *
  * Purely metadata: no Spark types, trivially property-testable.
  */
object Unify {

  final case class Candidate(
      bindings: Map[String, Binding],
      outputs: Vector[Vector[String]])

  /** All satisfying bindings + concrete output names for `task` over
    * frames described by their column lists.
    */
  def satisfy(task: Task, have: Vector[Vector[String]]): LazyList[Candidate] = {
    val (concrete, dynamic) = task.requires.partition(!_.vars.exists(_.isDynamic))
    bindReqs(concrete.toList ::: dynamic.toList, have, Map.empty)
      .map(b => Candidate(b, outputNames(task, b, have)))
  }

  private def bindReqs(
      reqs: List[Req],
      have: Vector[Vector[String]],
      bound: Map[String, Binding]): LazyList[Map[String, Binding]] =
    reqs match {
      case Nil => LazyList(bound)
      case req :: rest =>
        // resolve dynamic literals against what is already bound
        val vars = req.vars.map {
          case l @ Lit(n) if l.isDynamic => Lit(Template.expand(n, bound))
          case v => v
        }
        for {
          frameIdx <- LazyList.from(have.indices)
          cols <- bindVars(vars.toList, have(frameIdx))
          next <- bindReqs(rest, have,
            bound + (req.arg -> Binding(frameIdx, cols.toVector)))
        } yield next
    }

  /** All ways this requirement's variables match columns of one frame. */
  private def bindVars(
      vars: List[Variable],
      columns: Vector[String]): LazyList[List[ColMatch]] =
    vars match {
      case Nil => LazyList(Nil)
      case v :: rest =>
        for {
          c <- LazyList.from(columns)
          groups <- LazyList.from(v.matches(c))
          tail <- bindVars(rest, columns)
        } yield ColMatch(c, groups) :: tail
    }

  /** Concrete output column names per output frame: expand `makes`
    * templates; for `appends` tasks the columns of the frame bound by
    * the first requirement ride along (tasks.py:411-417), matching the
    * executor's append-join.
    */
  def outputNames(
      task: Task,
      bindings: Map[String, Binding],
      have: Vector[Vector[String]]): Vector[Vector[String]] = {
    val made = task.makes.map(_.map(t => Template.expand(t, bindings)))
    if (!task.appends) made
    else {
      val src = have(bindings(task.requires.head.arg).frameIdx)
      made.map(m => m ++ src.filterNot(m.contains))
    }
  }
}

package graft.planner

import scala.collection.immutable.Queue

/** Goal-directed plan search — the reference's BFS graph search
  * (SURVEY.md §2.A A4; /root/reference/frame_tasks/solve.py:30-118)
  * re-implemented natively.
  *
  * States are pools of frame column-sets (frames are only ever
  * appended, solve.py:131). Actions are satisfiable task calls that
  * produce at least one novel column-set (solve.py:49-54). Generic
  * (pattern-requiring) tasks apply at most `maxRepeatGeneric` times
  * per path (solve.py:11,37-43) — the termination guard against
  * `(.+)`-patterned tasks looping on their own outputs.
  *
  * The search is metadata-only and must stay in the milliseconds for
  * O(10) tasks (the reference burned 13.3 s here, BASELINE.md) — we
  * dedupe visited states on a canonical Set[Set[String]] key and
  * enumerate bindings lazily.
  */
object Planner {

  final case class Action(
      task: Task,
      bindings: Map[String, Binding],
      outputs: Vector[Vector[String]])

  final case class State(
      frames: Vector[Vector[String]],
      genericUses: Map[String, Int]) {
    def key: Set[Set[String]] = frames.map(_.toSet).toSet
  }

  def initial(sources: Vector[Vector[String]]): State =
    State(sources, Map.empty.withDefaultValue(0))

  /** All legal next actions (solve.py:30-59). */
  def actions(
      registry: TaskRegistry,
      state: State,
      maxRepeatGeneric: Int = 1): Vector[Action] =
    registry.tasks.flatMap { task =>
      if (task.isGeneric && state.genericUses(task.name) >= maxRepeatGeneric)
        Vector.empty
      else
        Unify.satisfy(task, state.frames)
          .filter(c => c.outputs.exists(o => !state.key.contains(o.toSet)))
          .map(c => Action(task, c.bindings, c.outputs))
          .toVector
    }

  def apply(state: State, action: Action): State =
    State(
      state.frames ++ action.outputs,
      if (action.task.isGeneric)
        state.genericUses.updated(action.task.name,
          state.genericUses(action.task.name) + 1)
      else state.genericUses)

  def goalReached(state: State, goal: Vector[Vector[String]]): Boolean =
    goal.forall(g => state.frames.exists(f => g.forall(f.contains)))

  /** Shortest plan from sources to goal; None when unreachable.
    *
    * Delegates to [[findPathAStar]] — the default since round 7: on
    * every reference-shaped fixture A* returns the IDENTICAL action
    * sequence to BFS while expanding no more states (PlannerSpec pins
    * both properties), and on deep chains it expands far fewer. BFS
    * remains available as [[findPathBfs]] for the corner case the A*
    * Scaladoc documents.
    */
  def findPath(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): Option[Vector[Action]] =
    findPathAStar(registry, sources, goal, maxRepeatGeneric, maxExpansions)

  /** BFS shortest plan — the exhaustive baseline A* is checked
    * against. Returns (plan, states expanded).
    */
  def findPathBfsCounted(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): (Option[Vector[Action]], Int) = {
    val start = initial(sources)
    if (goalReached(start, goal)) return (Some(Vector.empty), 0)
    var visited = Set(start.key)
    var queue = Queue((start, Vector.empty[Action]))
    var expansions = 0
    while (queue.nonEmpty && expansions < maxExpansions) {
      val ((state, path), rest) = queue.dequeue
      queue = rest
      expansions += 1
      for (a <- actions(registry, state, maxRepeatGeneric)) {
        val next = apply(state, a)
        if (!visited.contains(next.key)) {
          if (goalReached(next, goal)) return (Some(path :+ a), expansions)
          visited += next.key
          queue = queue.enqueue((next, path :+ a))
        }
      }
    }
    (None, expansions)
  }

  def findPathBfs(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): Option[Vector[Action]] =
    findPathBfsCounted(registry, sources, goal, maxRepeatGeneric,
      maxExpansions)._1

  /** A* search: f = plan length + number of goal sets no pooled frame
    * covers yet. The heuristic is admissible whenever each task
    * application satisfies at most one outstanding goal set (true for
    * every reference-shaped task — single-frame outputs and disjoint
    * goals), so the plan is minimal there; in the corner case where
    * one new frame covers several goal sets at once it may return a
    * plan one step off minimal ([[findPathBfs]] covers that case).
    * Tie-breaking is insertion-order FIFO, which makes equal-f
    * exploration order match BFS exactly — that is why the fixtures
    * get IDENTICAL plans, not merely equal-length ones. Returns
    * (plan, states expanded).
    */
  def findPathAStarCounted(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): (Option[Vector[Action]], Int) = {
    def h(state: State): Int =
      goal.count(g => !state.frames.exists(f => g.forall(f.contains)))
    val start = initial(sources)
    if (goalReached(start, goal)) return (Some(Vector.empty), 0)
    // ordered by f asc; tie-broken by insertion order for stability
    implicit val ord: Ordering[(Int, Long, State, Vector[Action])] =
      Ordering.by(e => (-e._1, -e._2))
    val open = scala.collection.mutable.PriorityQueue(
      (h(start), 0L, start, Vector.empty[Action]))
    var visited = Set(start.key)
    var expansions = 0
    var tick = 0L
    while (open.nonEmpty && expansions < maxExpansions) {
      val (_, _, state, path) = open.dequeue()
      expansions += 1
      for (a <- actions(registry, state, maxRepeatGeneric)) {
        val next = apply(state, a)
        if (!visited.contains(next.key)) {
          if (goalReached(next, goal)) return (Some(path :+ a), expansions)
          visited += next.key
          tick += 1
          open.enqueue((path.length + 1 + h(next), tick, next, path :+ a))
        }
      }
    }
    (None, expansions)
  }

  def findPathAStar(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): Option[Vector[Action]] =
    findPathAStarCounted(registry, sources, goal, maxRepeatGeneric,
      maxExpansions)._1
}

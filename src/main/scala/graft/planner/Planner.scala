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

  /** Relaxed-reachability depth: one relaxed level applies EVERY
    * currently-satisfiable novel action at once and pools all the
    * outputs. Unification is monotone in the frame pool (more frames
    * can only enable more bindings), so by induction the relaxed pool
    * after d levels contains every frame ANY real d-step plan from
    * `state` could have produced — the number of levels until the
    * goal is covered is a lower bound on the remaining plan length.
    * Two sharper consequences fall out:
    *  - a fixpoint that never covers the goal proves the goal
    *    unreachable from `state` ([[Unreachable]] — A* prunes the
    *    branch instead of flooding it);
    *  - the bound is CONSISTENT: a successor's pool sits inside this
    *    state's level-1 pool, so the estimate drops by at most one
    *    per real step (closed-set A* stays optimal).
    * Generic-use caps are deliberately ignored (ignoring a cap only
    * grows the pool, keeping the lower bound valid); the level cap
    * and frame budget bound the cost against `(.+)`-template
    * registries whose relaxation would grow forever — bailing out at
    * depth d is still a valid bound because the goal was uncovered
    * at every level checked so far.
    */
  private val RelaxLevelCap = 50
  private val RelaxFrameBudget = 4000
  private[planner] val Unreachable = Int.MaxValue / 4

  private[planner] def relaxedDepth(
      registry: TaskRegistry,
      state: State,
      goal: Vector[Vector[String]]): Int = {
    var frames = state.frames
    var key = state.key
    var d = 0
    while (d < RelaxLevelCap && frames.size <= RelaxFrameBudget) {
      if (goal.forall(g => frames.exists(f => g.forall(f.contains))))
        return d
      val novel = registry.tasks.iterator
        .flatMap(t => Unify.satisfy(t, frames).iterator.flatMap(_.outputs))
        .filter(o => !key.contains(o.toSet))
        .toVector.distinctBy(_.toSet)
      if (novel.isEmpty) return Unreachable
      frames = frames ++ novel
      key = key ++ novel.map(_.toSet)
      d += 1
    }
    d
  }

  /** A* search: f = plan length + max(uncovered goal sets,
    * [[relaxedDepth]]). The goal-set count is admissible whenever
    * each task application satisfies at most one outstanding goal set
    * (true for every reference-shaped task — single-frame outputs and
    * disjoint goals); the relaxed depth is admissible and consistent
    * unconditionally, and is what gives DEEP CHAINS their guidance
    * (the set count is a flat 1 along a chain, degenerating A* to
    * BFS; the relaxed depth counts the remaining links, so off-chain
    * distractors cost more than on-chain progress and dead branches
    * prune outright). In the corner case where one new frame covers
    * several goal sets at once the combined h may still overestimate
    * by the set count's excess and return a plan one step off minimal
    * ([[findPathBfs]] covers that case). Tie-breaking is
    * insertion-order FIFO, which keeps equal-f exploration in BFS
    * order. Returns (plan, states expanded).
    */
  def findPathAStarCounted(
      registry: TaskRegistry,
      sources: Vector[Vector[String]],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1,
      maxExpansions: Int = 100000): (Option[Vector[Action]], Int) = {
    val memo = scala.collection.mutable.HashMap.empty[Set[Set[String]], Int]
    def h(state: State): Int = {
      val sets = goal.count(g => !state.frames.exists(f => g.forall(f.contains)))
      if (sets == 0) 0
      else math.max(sets, memo.getOrElseUpdate(state.key,
        relaxedDepth(registry, state, goal)))
    }
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
          val hn = h(next)
          // provably-unreachable successors never enter the frontier
          if (hn < Unreachable) {
            tick += 1
            open.enqueue((path.length + 1 + hn, tick, next, path :+ a))
          }
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

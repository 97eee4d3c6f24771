package graft.planner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Plan execution — the reference's `perform_actions`/`call_task`
  * (SURVEY.md §2.A A5/A6; /root/reference/frame_tasks/solve.py:121-151,
  * tasks.py:164-275) as a fold over LAZY DataFrames.
  *
  * Differences from the reference, on purpose:
  *  - nothing materializes per step: each task output is a logical
  *    plan, so Catalyst optimizes the whole composed pipeline at the
  *    final action (column pruning subsumes the per-task reindex);
  *  - absent required/declared columns are hard errors, not warnings
  *    (the reference's disabled checks, decorator.py:35-36, signal the
  *    intent);
  *  - the append-join contract (tasks.py:262-269) joins each output
  *    with the deduplicated first-bound input frame on the matched key
  *    columns, left-joined so output rows are never dropped.
  */
object Executor {

  /** Backtick-quote a column name for string APIs (lineage names
    * contain dots).
    */
  private def q(name: String) = s"`${name.replace("`", "``")}`"

  def runPath(
      sources: Seq[DataFrame],
      path: Seq[Planner.Action]): Vector[DataFrame] =
    path.foldLeft(sources.toVector) { (pool, action) =>
      pool ++ callTask(pool, action)
    }

  /** Plan + execute to a goal; the returned pool has goal frames last
    * (latest-first is the reference's return_latest_first).
    */
  def run(
      registry: TaskRegistry,
      sources: Seq[DataFrame],
      goal: Vector[Vector[String]],
      maxRepeatGeneric: Int = 1): Vector[DataFrame] = {
    val cols = sources.toVector.map(_.columns.toVector)
    val path = Planner.findPath(registry, cols, goal, maxRepeatGeneric)
      .getOrElse(throw new RuntimeException("Path not found"))
    runPath(sources, path)
  }

  /** Invoke one bound task against the pool (tasks.py:164-275). */
  def callTask(pool: Vector[DataFrame], action: Planner.Action): Seq[DataFrame] = {
    val task = action.task
    // reindex each bound frame to exactly the required columns
    val frames: Map[String, DataFrame] = action.bindings.map {
      case (arg, Binding(frameIdx, cols)) =>
        val df = pool(frameIdx)
        val required = cols.map(_.column).distinct
        val missing = required.filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"task ${task.name}: arg $arg missing required columns $missing")
        arg -> df.select(required.map(c => col(q(c))): _*)
    }
    val input = TaskInput(frames, action.bindings, action.outputs)
    val outs = task.fn(input)
    require(outs.size == task.makes.size,
      s"task ${task.name}: returned ${outs.size} frames, declared ${task.makes.size}")

    val joined =
      if (!task.appends) outs
      else {
        val firstArg = task.requires.head.arg
        val b = action.bindings(firstArg)
        val key = b.cols.map(_.column).distinct
        val full = pool(b.frameIdx)
        outs.map { out =>
          val keyMissing = key.filterNot(out.columns.contains)
          require(keyMissing.isEmpty,
            s"append task ${task.name}: output must carry key columns $keyMissing")
          val carried = full.columns.toSeq.filterNot(out.columns.contains)
          out.join(
            full.dropDuplicates(key)
              .select((key ++ carried).map(c => col(q(c))): _*),
            key, "left")
        }
      }

    // hard-validate declared outputs (reference warns, tasks.py:270-273)
    joined.zip(action.outputs).map { case (df, declared) =>
      val missing = declared.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"task ${task.name}: output missing declared columns $missing " +
          s"(has ${df.columns.toSeq})")
      df
    }
  }
}

package graft.planner

import org.apache.spark.sql.DataFrame
import scala.util.matching.Regex

/** The task model — a brand-new, immutable Scala re-design of the
  * reference's decorator-built registry (SURVEY.md §2.A A1;
  * /root/reference/frame_tasks/decorator.py:14-111,
  * /root/reference/frame_tasks/tasks.py:130-162). No globals, no
  * locks: a registry is a value.
  *
  * Planning is metadata-only (column-NAME sets); execution composes
  * lazy DataFrames, so the whole planned pipeline reaches Catalyst as
  * one logical plan — fundamentally better than the reference's eager
  * per-task materialization (solve.py:121-135).
  */

/** A requirement variable: literal column name or regex pattern
  * (reference `Variable`, tasks.py:24-82: string equality or
  * `re.match`). A dynamic literal may contain `{arg...}` templates
  * resolved after other args bind (tasks.py:306-317).
  */
sealed trait Variable {
  /** Full match against a column name; Some(capture groups, full
    * match first) on success.
    */
  def matches(column: String): Option[Vector[String]]
  def isPattern: Boolean
  def isDynamic: Boolean = false
}

final case class Lit(name: String) extends Variable {
  def matches(column: String): Option[Vector[String]] =
    if (column == name) Some(Vector(column)) else None
  def isPattern = false
  override def isDynamic: Boolean = Template.isTemplated(name)
}

final case class Pat(pattern: String) extends Variable {
  private val re: Regex = pattern.r
  /** Python `re.match` semantics (anchored at start, prefix match) —
    * what the reference's Variable equality does (tasks.py:65-76).
    */
  def matches(column: String): Option[Vector[String]] =
    re.findPrefixMatchOf(column).map(m =>
      Vector(column) ++ m.subgroups.map(g => if (g == null) "" else g))
  def isPattern = true
}

/** One bound requirement variable: which column matched and its
  * capture groups (index 0 = the full column name).
  */
final case class ColMatch(column: String, groups: Vector[String])

/** One requirement: argument `arg` binds all `vars` within a single
  * frame (same-frame constraint, tasks.py:336-339).
  */
final case class Req(arg: String, vars: Vector[Variable])

object Req {
  def lit(arg: String, names: String*): Req = Req(arg, names.toVector.map(Lit(_)))
  def pat(arg: String, patterns: String*): Req = Req(arg, patterns.toVector.map(Pat(_)))
}

/** Binding of one argument: source frame index + per-variable match. */
final case class Binding(frameIdx: Int, cols: Vector[ColMatch])

/** Output-name templates `{arg}`, `{arg.varIdx}`, `{arg.varIdx.groupIdx}`
  * (reference grammar tasks.py:372-401). groupIdx 0 = whole matched
  * column name; groupIdx k>=1 = regex capture group k.
  */
object Template {
  private val Ref = raw"\{(\w+)(?:\.(\d+)(?:\.(\d+))?)?\}".r

  def isTemplated(s: String): Boolean = Ref.findFirstIn(s).isDefined

  /** Substitute bound values into a template; error on unbound refs. */
  def expand(template: String, bindings: Map[String, Binding]): String =
    Ref.replaceAllIn(template, m => {
      val arg = m.group(1)
      val varIdx = Option(m.group(2)).map(_.toInt).getOrElse(0)
      val grpIdx = Option(m.group(3)).map(_.toInt).getOrElse(0)
      val b = bindings.getOrElse(arg,
        throw new IllegalArgumentException(
          s"template '$template' references unbound arg '$arg'"))
      val cm = b.cols.lift(varIdx).getOrElse(
        throw new IllegalArgumentException(
          s"template '$template': arg '$arg' has no variable $varIdx"))
      val v = cm.groups.lift(grpIdx).getOrElse(
        throw new IllegalArgumentException(
          s"template '$template': match of '$arg.$varIdx' has no group $grpIdx"))
      Regex.quoteReplacement(v)
    })
}

/** The frames + metadata handed to a task body at execution time. */
final case class TaskInput(
    frames: Map[String, DataFrame],
    bindings: Map[String, Binding],
    expects: Vector[Vector[String]])

/** A task: named, with requirements, per-output-frame column
  * templates, and the `appends` contract (decorator.py:45-52 —
  * outputs are joined back onto the non-required columns of the first
  * bound input frame, keyed by that argument's matched columns).
  */
final case class Task(
    name: String,
    requires: Vector[Req],
    makes: Vector[Vector[String]],
    appends: Boolean = false)(
    val fn: TaskInput => Seq[DataFrame]) {
  def isGeneric: Boolean = requires.exists(_.vars.exists(_.isPattern))
  require(requires.nonEmpty, s"task $name has no requirements")
  require(
    requires.exists(r => !r.vars.forall(_.isDynamic)),
    s"task $name: all requirements dynamic (BadTask, tasks.py:311-314)")
}

/** Immutable registry (replaces the global dict tasks.py:18). */
final case class TaskRegistry(tasks: Vector[Task]) {
  def register(t: Task): TaskRegistry = {
    require(!tasks.exists(_.name == t.name), s"duplicate task ${t.name}")
    TaskRegistry(tasks :+ t)
  }
  def apply(name: String): Task = tasks.find(_.name == name).get
}

object TaskRegistry {
  val empty: TaskRegistry = TaskRegistry(Vector.empty)
  def of(ts: Task*): TaskRegistry = TaskRegistry(ts.toVector)
}

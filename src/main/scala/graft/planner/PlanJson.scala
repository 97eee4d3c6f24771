package graft.planner

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods._

/** Plan serialization — the reference round-trips plans through URL
  * query strings (SURVEY.md §2.A A7, browse.py:65-126) and keys its
  * result cache on the serialized plan (A8, serve.py:38-40). We
  * serialize to JSON: tasks by name, bindings, and concrete output
  * names, so a plan can be cached, shipped, or replayed against the
  * same registry without re-searching.
  */
object PlanJson {

  def toJson(path: Seq[Planner.Action]): String = {
    val j: JValue = path.map { a =>
      ("task" -> a.task.name) ~
        ("bindings" -> a.bindings.map { case (arg, b) =>
          arg -> (("frame" -> b.frameIdx) ~
            ("cols" -> b.cols.map(c =>
              ("column" -> c.column) ~ ("groups" -> c.groups))))
        }) ~
        ("outputs" -> a.outputs)
    }
    compact(render(j))
  }

  def fromJson(registry: TaskRegistry, json: String): Vector[Planner.Action] = {
    val JArray(actions) = parse(json): @unchecked
    actions.map { a =>
      val JString(taskName) = a \ "task": @unchecked
      val JObject(bindingFields) = a \ "bindings": @unchecked
      val bindings = bindingFields.map { case JField(arg, b) =>
        val JInt(frameIdx) = b \ "frame": @unchecked
        val JArray(cols) = b \ "cols": @unchecked
        arg -> Binding(frameIdx.toInt, cols.toVector.map { c =>
          val JString(column) = c \ "column": @unchecked
          val JArray(groups) = c \ "groups": @unchecked
          ColMatch(column,
            groups.toVector.map { case JString(g) => g; case other =>
              throw new IllegalArgumentException(s"bad group $other") })
        })
      }.toMap
      val JArray(outputs) = a \ "outputs": @unchecked
      val outs = outputs.toVector.map { case JArray(cols) =>
        cols.toVector.map { case JString(s) => s; case other =>
          throw new IllegalArgumentException(s"bad output $other") }
      case other => throw new IllegalArgumentException(s"bad outputs $other")
      }
      Planner.Action(registry(taskName), bindings, outs)
    }.toVector
  }

  /** Cache key for a serialized plan (A8: mmh3-of-plan-string in the
    * reference; sha-256 here).
    */
  def planKey(path: Seq[Planner.Action]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(toJson(path).getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
  }
}

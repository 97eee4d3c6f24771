package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the
  * Column API.
  *
  * Two paths:
  *  - [[register]]: per-session, for an already-built SparkSession;
  *  - [[GraftExtensions]]: a SparkSessionExtensions installer for
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    on spark-submit (the idiomatic cluster deployment).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "md5_prefix60" -> (exprs => Md5Prefix60(exprs(0))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (exprs: Seq[Expression]) => Md5Prefix60(exprs(0))))
    // declarative HOF dot products rewrite to the codegen expression
    e.injectOptimizerRule(_ => DotProductRewrite)
    // two-stage map-side-pruned top-k per key (graft.plans.TopKPerKey)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // maintenance SQL for manifest tables: OPTIMIZE [ZORDER BY] /
    // VACUUM [RETAIN n VERSIONS] / DESCRIBE HISTORY
    e.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] expression. Higher-order
  * functions are interpreted per element in Spark (no codegen), which
  * makes the declarative form the dominant cost in pairwise-similarity
  * plans; the custom expression is the same left-to-right float
  * summation, bit-identical, at codegen speed. This is the Catalyst
  * `Rule[LogicalPlan]` extension surface: users write the idiomatic
  * declarative form, the session rewrites it (injected via
  * [[GraftExtensions]] or `spark.experimental.extraOptimizations`).
  *
  * The match is deliberately strict — multiply-of-the-two-lambda-args
  * zipped over two `array<double>` columns, zero literal 0.0,
  * add-merge, identity finish — so no other aggregate shape can be
  * touched. (Caveat, documented: for length-mismatched arrays
  * `zip_with` pads with null and the fold returns null, while
  * [[DotProduct]] assumes fixed-width embedding columns; the rule is
  * opt-in for pipelines that guarantee fixed-width vectors.)
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def sameVars(bodyA: NamedLambdaVariable, bodyB: NamedLambdaVariable,
      args: Seq[Expression]): Boolean = args match {
    case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      Set(bodyA.exprId, bodyB.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(
              Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              mArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(sx: NamedLambdaVariable, sy: NamedLambdaVariable, _),
            sArgs, _),
          finish)
        if isIdentity(finish) && sameVars(mx, my, mArgs) &&
          sameVars(sx, sy, sArgs) && isDoubleArray(l) && isDoubleArray(r) =>
        DotProduct(l, r)
    }
}

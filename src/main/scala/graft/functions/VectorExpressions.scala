package graft.functions

import org.apache.spark.sql.{graftShims, Column}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression for the similarity-search hot path.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * INTERPRETED — every element goes through a lambda dispatch — which
  * dominates pairwise-cosine runtime. This expression participates in
  * whole-stage codegen with a tight primitive loop over the unsafe
  * array data (preference order per the project guide: compose
  * built-ins < custom Expression < custom physical operator).
  *
  * Summation is sequential left-to-right, matching both the
  * higher-order-function formulation and DuckDB's list_sum fold, so
  * swapping it in changes no result bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product of two ArrayType(DoubleType) columns. */
  def dot_product(a: Column, b: Column): Column =
    graftShims.toColumn(
      DotProduct(graftShims.toExpression(a), graftShims.toExpression(b)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index on the 16-bit grid.
  *
  * The classic per-level rotate/reflect recurrence (the d-to-xy walk
  * of Hilbert's construction): at each scale bit, the quadrant
  * contributes `s^2 * (3*rx XOR ry)` to the index and the lower-order
  * coordinates are rotated into the quadrant's frame. Unlike Morton's
  * bit interleave, the fold carries MUTATING (x, y) state across the
  * 16 levels — each level reads the previous level's coordinates
  * several times, so a naive Column-expression tree is exponential.
  * That makes it the textbook case for a custom codegen'd Expression
  * (project preference order: compose built-ins < custom Expression):
  * eval and doGenCode both run the same tight 16-iteration loop.
  *
  * Why bother next to Morton: Hilbert has no "seam" discontinuities
  * (consecutive curve positions are always grid neighbors), so file
  * boxes on a range-clustered write are tighter in the worst case —
  * LayoutSpec measures the records-read comparison on the same query.
  */
object HilbertCurve {
  val Bits = 16

  /** (x, y) -> distance along the order-16 Hilbert curve. Pure static
    * long arithmetic so codegen calls land on one JIT-friendly method.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_key(x, y)`: the Hilbert index of two coordinates, each
  * quantized to its low 16 bits (quantize wider domains first, like
  * [[graft.ops.Layout.zkey]]).
  */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertCurve.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftShims
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

/** Generic d-dimensional Morton interleave as static long arithmetic.
  *
  * Bit `i` of coordinate `j` lands at position `i*d + j` — the exact
  * contract of [[graft.ops.Layout.zkeyNSql]], so the stored key stays
  * textually mirrorable in any SQL engine. The per-bit select-shift
  * form as a Column tree is O(bits*d) nodes evaluated per row (and a
  * clustered write evaluates the key in the range-sampler, the
  * exchange AND the sort); folded into one static loop the whole key
  * is a single JIT-compiled method call per row, which is what makes
  * the one-time 100-TB curve write CPU-bound on the sort, not the key.
  */
object MortonCurve {
  /** Contribution of coordinate `j` (of `d`): its low `bits` bits
    * spread to positions `i*d + j`. The full key is the OR across
    * coordinates.
    */
  def spreadAt(v: Long, bits: Int, d: Int, j: Int): Long = {
    val m = v & ((1L << bits) - 1)
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((m >> i) & 1L) << (i * d + j)
      i += 1
    }
    r
  }
}

/** `morton_key(c0..cd-1, bits)`: the d-dimensional Morton key, each
  * coordinate quantized to its low `bits` bits; `bits*d` must stay
  * under 63 (BIGINT, no sign bit). Null if any coordinate is null.
  */
case class MortonKey(children: Seq[Expression], bits: Int)
    extends Expression with ImplicitCastInputTypes {
  require(children.nonEmpty && bits * children.size <= 63,
    s"$bits bits x ${children.size} dims > 63")

  // analysis-time type contract (round-10 advisor): without it a
  // non-long child compiles the plan but ClassCastExceptions in
  // interpreted eval and emits ill-typed Java in codegen; with it
  // analysis inserts the implicit cast or rejects the query
  override def inputTypes: Seq[graftShims.AbsDataType] =
    Seq.fill(children.size)(LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = children.size
    var r = 0L
    var j = 0
    while (j < d) {
      val v = children(j).eval(input)
      if (v == null) return null
      r |= MortonCurve.spreadAt(v.asInstanceOf[Long], bits, d, j)
      j += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val d = children.size
    val evals = children.map(_.genCode(ctx))
    // evaluate children in order, short-circuiting on the first null
    val body = evals.zipWithIndex.map { case (e, j) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} |= graft.functions.MortonCurve.spreadAt(
         |      ${e.value}, $bits, $d, $j);
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        $body
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonKey =
    copy(children = newChildren)
}

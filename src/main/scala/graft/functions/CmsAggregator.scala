package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator folding a token stream straight into the dense
  * count-min grid — the single-pass form of
  * [[graft.ops.Sketch.cmsCells]].
  *
  * Why an Aggregator next to the row formulation: the row form
  * explodes every token into Depth (r, bucket) rows before the
  * partial aggregation collapses them — a 4x row stream through the
  * hash-map aggregate. Here each partition folds its tokens directly
  * into one fixed Depth x Width long buffer (128 KB), and only those
  * buffers merge across the shuffle; there is no per-token row blowup
  * at all. Same bucket arithmetic (computed in Column space by the
  * caller), so the grids are cell-for-cell identical — SketchSpec
  * asserts it differentially.
  */
object CmsAggregator {

  import graft.ops.Sketch.{Depth, Width}

  /** IN = the Depth bucket indexes of one token occurrence,
    * BUF/OUT = the dense grid, row-major (r * Width + bucket).
    */
  val cmsGrid: Aggregator[Seq[Long], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      def zero: Array[Long] = Array.fill(Depth * Width)(0L)
      def reduce(buf: Array[Long], buckets: Seq[Long]): Array[Long] = {
        var r = 0
        while (r < Depth) {
          buf(r * Width + buckets(r).toInt) += 1L
          r += 1
        }
        buf
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}

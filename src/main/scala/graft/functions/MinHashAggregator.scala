package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator building a MinHash signature from exploded
  * (doc, shingle-hash) rows — the UDAF surface of the engine
  * (SURVEY.md §2.B UDF/UDAF row).
  *
  * Why an Aggregator and not the array-per-row formulation in
  * graft.ops.Dedup: at 100 TB a document's shingles may not fit one
  * row, and sketches should reduce map-side. An Aggregator gets
  * partial aggregation for free — each partition folds its shingle
  * stream into a 16-long buffer, and only buffers cross the shuffle
  * (O(docs x 128 bytes), independent of corpus size).
  *
  * Uses the same permutation constants as Dedup.MinhashAB, so both
  * formulations produce identical signatures.
  */
object MinHashAggregator {

  val K: Int = graft.ops.Dedup.MinhashAB.size
  private val A = graft.ops.Dedup.MinhashAB.map(_._1).toArray
  private val B = graft.ops.Dedup.MinhashAB.map(_._2).toArray
  private val M = graft.ops.Dedup.MinhashMod

  /** Aggregator[IN = 30-bit shingle hash, BUF = running minima,
    * OUT = signature].
    */
  val minhashSignature: Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = Array.fill(K)(Long.MaxValue)
      def reduce(buf: Array[Long], h: Long): Array[Long] = {
        var i = 0
        while (i < K) {
          val v = (A(i) * h + B(i)) % M
          if (v < buf(i)) buf(i) = v
          i += 1
        }
        buf
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < K) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
        x
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}

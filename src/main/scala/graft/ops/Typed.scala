package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A lineitem projection with a case-class Encoder — the typed face of
  * the engine's untyped-DataFrame core (SURVEY.md §1.4 picks DataFrame
  * as the primary abstraction; `Dataset[T]` is provided where static
  * types help, e.g. compile-checked custom aggregation logic).
  */
case class LineItemRow(
    l_returnflag: String,
    l_quantity: Double,
    l_extendedprice: Double,
    l_discount: Double)

object Typed {

  /** Typed Aggregator: (row count, net revenue) per group. Buffers are
    * tuple-encoded, so partial aggregation (map-side combine) applies
    * exactly as with built-in aggregates.
    */
  val revenueAgg: Aggregator[LineItemRow, (Long, Double), (Long, Double)] =
    new Aggregator[LineItemRow, (Long, Double), (Long, Double)] {
      def zero: (Long, Double) = (0L, 0.0)
      def reduce(b: (Long, Double), a: LineItemRow): (Long, Double) =
        (b._1 + 1, b._2 + a.l_extendedprice * (1 - a.l_discount))
      def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Long, Double)): (Long, Double) = r
      def bufferEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      def outputEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    }

  /** Typed pipeline end-to-end: case-class Dataset -> typed filter ->
    * `groupByKey` + custom Aggregator -> back to DataFrame for the
    * final (codegen'd) rounding and ordering. Semantically identical
    * to the untyped groupBy form, proven by the shared oracle.
    */
  def typedRevenueByFlag(li: DataFrame): DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    li.select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .as[LineItemRow]
      .filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .agg(revenueAgg.toColumn.name("agg"))
      .toDF()
      .select(col("key").as("l_returnflag"),
        col("agg._1").as("n"),
        round(col("agg._2"), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  val typedRevenueOracle: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem WHERE l_quantity > 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}

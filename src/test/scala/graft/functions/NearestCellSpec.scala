package graft.functions

import graft.SparkSpec
import graft.ops.T
import org.apache.spark.sql.functions._

/** [[NearestCell]] is the map-only replacement for the
  * `crossJoin(broadcast(cents)) + groupBy struct-max` IVF assignment.
  * The swap is only sound if it is ranking-identical — same rounded
  * cosine, same smallest-cid tiebreak — so this spec runs BOTH
  * formulations over the real embeddings fixture and demands
  * bit-equal cell assignments, and asserts the codegen'd path agrees
  * with the interpreted eval.
  */
class NearestCellSpec extends SparkSpec {

  private def dot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = VectorFunctions.dot_product(a, b)

  test("nearest_cell matches the crossJoin struct-max assignment") {
    val all = T(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = all.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))

    val viaJoin = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
          .as("ccos"))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("negcid"))).as("best"))
      .select(col("vec_id"), (-col("best.negcid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val rows = cents.orderBy("cid").collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    val nrms = rows.map(_.getDouble(2))
    val viaExpr = all.select(col("vec_id"),
        VectorFunctions.nearest_cell(col("v"), col("nrm"), ids, vecs, nrms)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaExpr.size == viaJoin.size)
    val diffs = viaJoin.collect {
      case (id, cell) if viaExpr(id) != cell => (id, cell, viaExpr(id))
    }
    assert(diffs.isEmpty, s"assignment mismatches: ${diffs.take(5)}")
  }

  test("nearest_cells (multi-probe) matches the window rn<=nprobe form") {
    val nprobe = 3
    val all = T(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = all.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid").asc)
    val viaWindow = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
          .as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap

    val rows = cents.orderBy("cid").collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    val nrms = rows.map(_.getDouble(2))
    val viaExpr = all.select(col("vec_id"),
        posexplode(VectorFunctions.nearest_cells(
          col("v"), col("nrm"), ids, vecs, nrms, nprobe))
          .as(Seq("pos", "cell")))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1) -> r.getLong(2)).toMap

    assert(viaExpr.size == viaWindow.size,
      s"probe-set sizes differ: ${viaExpr.size} vs ${viaWindow.size}")
    val diffs = viaWindow.collect {
      case (key, cell) if viaExpr(key) != cell => (key, cell, viaExpr(key))
    }
    assert(diffs.isEmpty, s"probe mismatches: ${diffs.take(5)}")
    // element 0 is always the single-cell answer
    val first = all.select(col("vec_id"),
      element_at(VectorFunctions.nearest_cells(
        col("v"), col("nrm"), ids, vecs, nrms, nprobe), 1).as("c0"),
      VectorFunctions.nearest_cell(col("v"), col("nrm"), ids, vecs, nrms)
        .as("c1"))
      .filter(col("c0") =!= col("c1")).count()
    assert(first == 0L, "nearest_cells[0] must equal nearest_cell")
  }

  test("codegen and interpreted eval agree (incl. round6 parity)") {
    // round6 must be Spark's Round semantics bit-for-bit — probe the
    // knife edges where a naive binary rounding would differ
    val probes = Seq(0.1234565, -0.1234565, 0.9999995, 1.0, -1.0,
      2.5e-7, -2.5e-7, 0.123456749999)
    for (x <- probes) {
      val sparkRound = spark.range(1)
        .select(round(lit(x), 6)).head().getDouble(0)
      assert(NearestCell.round6(x) == sparkRound,
        s"round6($x): ${NearestCell.round6(x)} vs Spark $sparkRound")
    }
    // non-finite inputs pass through like Spark's Round instead of
    // throwing (BigDecimal.valueOf rejects them)
    assert(NearestCell.round6(Double.NaN).isNaN)
    assert(NearestCell.round6(Double.PositiveInfinity).isPosInfinity)
  }

  test("a zero-norm vector assigns to the smallest cell, not a crash") {
    // nrm = 0 makes every cosine NaN; Double.compare orders NaN
    // greatest (like the struct-max form), ties break to the first =
    // smallest cid — the assignment sweep must survive it
    val ids = Array(3L, 7L)
    val vecs = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val nrms = Array(1.0, 1.0)
    val out = spark.range(1)
      .select(VectorFunctions.nearest_cell(
        array(lit(0.0), lit(0.0)), lit(0.0), ids, vecs, nrms).as("cell"))
      .head().getLong(0)
    assert(out == 3L, s"zero-norm vector assigned to cell $out")
  }
}

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

  test("sub-1e-6 raw ties round equal and break by id (two-pass sliver)") {
    // The two-pass argmax tracks RAW cosines in pass 1 and only rounds
    // the near-top sliver in pass 2. These fixtures pin the case a
    // naive raw-argmax would get wrong: raws within 1e-6 that round to
    // the SAME 6-dp value, where the rounded-desc/id-asc contract must
    // pick the smaller id even though its raw is strictly smaller.
    // d=1, unit norms, so cosine == the cell vector's single component.
    val v = array(lit(1.0))

    // raw(id=9) = 0.12345649 > raw(id=2) = 0.12345641, both round to
    // 0.123456 -> id 2 must win
    val tieIds = Array(9L, 2L)
    val tieVecs = Array(Array(0.12345649), Array(0.12345641))
    val ones = Array(1.0, 1.0)
    val tie = spark.range(1)
      .select(VectorFunctions.nearest_cell(v, lit(1.0), tieIds, tieVecs, ones))
      .head().getLong(0)
    assert(tie == 2L, s"rounded tie must break to the smaller id, got $tie")

    // just across the HALF_UP boundary: 0.1234565 -> 0.123457 beats
    // 0.12345649 -> 0.123456 despite a raw gap of only 1e-8
    val edgeIds = Array(4L, 1L)
    val edgeVecs = Array(Array(0.1234565), Array(0.12345649))
    val edge = spark.range(1)
      .select(VectorFunctions.nearest_cell(v, lit(1.0), edgeIds, edgeVecs, ones))
      .head().getLong(0)
    assert(edge == 4L, s"HALF_UP boundary winner wrong: $edge")

    // multi-probe: the cutoff sliver must admit the id-2 cell into the
    // top-2 even though its raw ranks third
    val mIds = Array(5L, 9L, 2L)
    val mVecs = Array(Array(0.5), Array(0.12345649), Array(0.12345641))
    val mOnes = Array(1.0, 1.0, 1.0)
    val probes = spark.range(1)
      .select(VectorFunctions.nearest_cells(v, lit(1.0), mIds, mVecs, mOnes, 2))
      .head().getSeq[Long](0)
    assert(probes == Seq(5L, 2L), s"multi-probe sliver wrong: $probes")
  }
}

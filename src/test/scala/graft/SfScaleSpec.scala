package graft

import org.apache.spark.sql.functions._

/** Pins for the SfScale per-copy embedding transform — the invariants
  * the multi-SF bench program leans on (PLANS.md): the transform must
  * be an exact isometry inside each copy (so every copy reproduces
  * the base corpus's near-dup pairs and pair volume scales exactly
  * `mult`x) and pairwise-DISTINCT across copies (so cross-copy
  * similarity is scrambled, not duplicated — the round-10 advisor
  * found the shift-only transform repeats verbatim at copy = dim,
  * planting cross-copy exact duplicates at mult=100).
  */
class SfScaleSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64
  // integer-valued components: their double dot products are exact
  // under ANY summation order, so isometry can be asserted with ==
  private val u = (1 to dim).map(d => ((d * 7) % 13 - 6).toFloat)
  private val v = (1 to dim).map(d => ((d * 11) % 17 - 8).toFloat)

  private def transformed(vec: Seq[Float], copies: Seq[Int]): Map[Int, Seq[Float]] =
    copies.map(c => (c, vec)).toDF("copy", "embedding")
      .select(col("copy"),
        SfScale.perturbEmbedding(col("copy").cast("long"), col("embedding"))
          .as("t"))
      .as[(Int, Seq[Float])].collect().toMap

  test("per-copy transforms are pairwise distinct well past copy = dim") {
    // copy 64 vs 0 and 65 vs 1 were the advisor's byte-identical
    // collisions under shift-only; 128 exercises block 2
    val copies = Seq(0, 1, 7, 63, 64, 65, 99, 100, 127, 128, 191)
    val t = transformed(u, copies)
    for (a <- copies; b <- copies if a < b)
      assert(t(a) != t(b), s"copies $a and $b transform identically")
  }

  test("the transform is an exact isometry within every copy") {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val copies = Seq(0, 3, 64, 100, 150)
    val tu = transformed(u, copies)
    val tv = transformed(v, copies)
    for (c <- copies) {
      assert(dot(tu(c), tu(c)) == dot(u, u), s"norm changed in copy $c")
      assert(dot(tu(c), tv(c)) == dot(u, v), s"dot changed in copy $c")
    }
  }

  test("copy 0 is verbatim; a block>0 copy differs from shift-only by signs alone") {
    val t = transformed(u, Seq(0, 70))
    assert(t(0) == u)
    // copy 70: shift (70*7) mod 64 = 42, block 70/64 = 1
    val shiftOnly = u.drop(42) ++ u.take(42)
    assert(t(70) != shiftOnly, "sign flips inactive for block 1")
    assert(t(70).map(math.abs) == shiftOnly.map(math.abs),
      "flip factor must change signs only, never order or magnitude")
  }
}

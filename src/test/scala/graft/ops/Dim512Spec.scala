package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-size pin at PRODUCTION embedding widths (round-13 verdict #3).
  *
  * The ANN paths carry O(d) driver-derived constants into the plan —
  * sign-LSH hyperplanes, SQ8 per-dimension min/range arrays, PQ
  * codebooks. At the fixture width (d=64) any representation works;
  * at real widths (d=512/1024) a representation that grows the plan
  * TREE linearly in d (e.g. a d-child CreateArray of literals) grows
  * analysis time and generated-code size with it, and the first
  * symptom is a silent 64 KB-method fallback to interpreted
  * evaluation — a 10x slowdown no correctness gate would notice.
  *
  * These tests build and EXECUTE knnLsh / knnSq8Recall / knnPq at
  * d=512 with `spark.sql.codegen.fallback=false`, so a Janino
  * compile failure aborts instead of degrading, and pin a generous
  * wall-clock bound on plan build + execution. The mitigations under
  * pin: hyperplanes and SQ8 min/range ride as single ArrayData
  * literals (typedLit — one plan node at any d); the PQ codebook is a
  * reference object on a custom expression (never a literal tree).
  */
class Dim512Spec extends SparkSpec {

  private val D = 512
  private val N = 306L

  /** Deterministic synthetic corpus: 306 vectors of width 512 (no
    * RNG — values from a fixed modular formula, so failures
    * reproduce).
    */
  private lazy val emb512: DataFrame = {
    import spark.implicits._
    (0L until N).map { id =>
      (id, (0 until D).map(d =>
        (((id * 31 + d * 7 + 13) % 97).toFloat / 97.0f) - 0.5f))
    }.toDF("vec_id", "embedding")
  }

  private def strictCodegen[A](body: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Build + execute under strict codegen, returning (rows, secs). */
  private def run(df: => DataFrame): (Array[org.apache.spark.sql.Row], Double) =
    strictCodegen {
      val t0 = System.nanoTime()
      val rows = df.collect()
      (rows, (System.nanoTime() - t0) / 1e9)
    }

  // generous CI-noise-proof bound: the observed build+run is seconds;
  // an interpreted fallback or a super-linear analysis pass is minutes
  private val BoundSec = 90.0

  test("sign-LSH kNN at d=512: bounded build+run, codegen-strict, sane top-k") {
    val (rows, secs) = run(Similarity.knnLsh(emb512, nQueries = 10, k = 3, dim = D))
    assert(secs < BoundSec, s"knnLsh d=512 took $secs s")
    assert(rows.nonEmpty)
    // per-query rank never exceeds k; cosine in [-1, 1]
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("SQ8 recall at d=512: bounded build+run, codegen-strict, recall in [0,1]") {
    // fully data-driven min/max (posexplode over 512 dims) -> typedLit
    val (rows, secs) = run(Similarity.knnSq8Recall(emb512, nQueries = 10, k = 3))
    assert(secs < BoundSec, s"knnSq8Recall d=512 took $secs s")
    assert(rows.length == 10)
    assert(rows.forall { r =>
      val rec = r.getDouble(1); rec >= 0.0 && rec <= 1.0
    })
    // SQ8 at 8 bits/dim is a fine quantization: recall collapsing to 0
    // would mean the dequantized ranking broke, not noise
    val mean = rows.map(_.getDouble(1)).sum / rows.length
    assert(mean > 0.5, s"mean SQ8 recall at d=512 = $mean")
  }

  test("PQ ADC at d=512 (8 x 64-dim subspaces): bounded, codegen-strict, k per query") {
    val (rows, secs) = run(Similarity.knnPq(emb512, nQueries = 10, k = 3, subDim = D / 8))
    assert(secs < BoundSec, s"knnPq d=512 took $secs s")
    // every query scores the whole corpus under brute-force ADC, so
    // exactly k neighbors per query
    assert(rows.length == 30, s"got ${rows.length} rows")
    assert(rows.map(_.getLong(0)).distinct.length == 10)
  }

  test("IVF kNN at d=512: trained centroids, bounded, codegen-strict") {
    // fully data-driven: centroids are trained from the vectors (their
    // width comes from the data) and ride into NearestCell as
    // reference objects, never literal trees
    val (rows, secs) = run(Similarity.knnIvf(emb512, nQueries = 10, k = 3))
    assert(secs < BoundSec, s"knnIvf d=512 took $secs s")
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
  }

  test("trained-PQ rerank at d=512 (Lloyd-refined 8 x 64-dim codebook): bounded, codegen-strict") {
    val (rows, secs) = run(
      Similarity.knnPqTrained(emb512, nQueries = 10, k = 3, subDim = D / 8))
    assert(secs < BoundSec, s"knnPqTrained d=512 took $secs s")
    // rerank scores the ADC shortlist exactly: k rows per query
    assert(rows.length == 30, s"got ${rows.length} rows")
  }

  test("d=512 LSH plan stays inside whole-stage codegen (no interpreted span)") {
    val df = Similarity.knnLsh(emb512, nQueries = 10, k = 3, dim = D)
    df.collect() // AQE only materializes codegen stages at execution
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the "*(id)" star prefix; a plan
    // with zero stars would mean every span fell back to interpreted
    assert(plan.contains("*("), plan.take(3000))
  }

  // ---- the near-dup / semantic-cluster path at production width
  // (round-14 verdict #7: knn paths were pinned at d=512, the
  // SemDeDup pipeline a real ingest runs — pair scan + connected
  // components — was not)

  /** 306 vectors plus a planted near-dup of each: one component
    * nudged by 0.01 (cosine >> 0.99 at this norm), variant id =
    * vec_id + 1_000_000. Components are murmur3-mixed (deterministic
    * across runs, but with NO linear structure — the knn fixture's
    * modular formula repeats vectors every 97 ids and correlates
    * shifted ids, which would plant unintended extra pairs), so the
    * only cosine >= 0.9 pairs are the planted ones.
    */
  private lazy val allV512: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def comp(id: Long, d: Int): Double = {
      val h = scala.util.hashing.MurmurHash3.stringHash(s"v512_${id}_$d")
      (((h % 1000) + 1000) % 1000) / 1000.0 - 0.5
    }
    val base = (0L until N).map(id => (id, (0 until D).map(comp(id, _))))
    val variants = base.map { case (id, v) =>
      (id + 1000000L, (v.head + 0.01) +: v.tail)
    }
    (base ++ variants).toDF("vec_id", "v")
  }

  test("near-dup pair scan at d=512: bounded, codegen-strict, finds planted pairs") {
    val planes = Similarity.planesFor(2 * N)
    val (rows, secs) = run(
      Similarity.nearDupPairsV(allV512, 0.9, planes, D)
        .orderBy("id_a", "id_b"))
    assert(secs < BoundSec, s"nearDupPairsV d=512 took $secs s")
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair is a planted (orig, variant); multi-probe radius 1
    // recovers essentially all of them (missing one needs >= 2 plane
    // flips on a ~0.0015 rad perturbation)
    assert(pairs.forall { case (a, b) => b == a + 1000000L }, pairs.take(5))
    assert(pairs.size >= (N * 95) / 100,
      s"found ${pairs.size} of $N planted near-dup pairs")
    assert(rows.forall(_.getDouble(2) >= 0.9))
  }

  test("semantic clusters at d=512: bounded, codegen-strict, one cluster per planted pair") {
    val planes = Similarity.planesFor(2 * N)
    val pairSet = Similarity.nearDupPairsV(allV512, 0.9, planes, D)
      .collect().map(_.getLong(0)).toSet
    val (rows, secs) = run(
      Similarity.embeddingClustersV(allV512, 0.9, planes, D))
    assert(secs < BoundSec, s"embeddingClustersV d=512 took $secs s")
    // each planted pair is its own component: canonical = the
    // original id, size exactly 2
    assert(rows.map(_.getLong(0)).toSet == pairSet)
    assert(rows.forall(_.getLong(1) == 2L),
      rows.filter(_.getLong(1) != 2L).take(3).toSeq)
  }
}

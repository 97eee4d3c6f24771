package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical-sanity gate for the approximate paths.
  *
  * A green oracle hash proves ENGINE PARITY (Spark computed the same
  * numbers DuckDB would), not that the numbers are any good: an
  * untrained codebook, a rank bug in a quantizer, or a missing HLL
  * branch can all hash-match perfectly while the estimator is junk
  * (round-6 lesson: SQ8 ranked by raw code dots hash-matched at 0.03
  * recall). This suite pins FLOORS on every measured recall and ERROR
  * BANDS on every sketch estimate, at sf0.01 — the same scale the
  * driver measures — so a quality regression fails CI even when the
  * hashes stay green.
  *
  * Floors are round-7 measured values minus a safety margin (the
  * computations are deterministic: hash-seeded, fixed data), so any
  * future drop past the margin is a real regression, not noise.
  */
class QualitySpec extends SparkSpec {

  // the driver's measurement scale — floors below correspond 1:1 to
  // the per-query results the correctness gate dumps
  override val sf = "/root/testdata/sf0.01"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def meanRecall(df: DataFrame): Double =
    df.agg(avg("recall")).head().getDouble(0)

  // measured at round 7 (mean recall@3 over 50 queries, sf0.01):
  //   lsh_probe 0.4933  ivf 0.4267  ivfpq 0.3800  pq_trained 0.6067
  //   pq_rerank 0.5600  sq8 0.9600
  test("ANN recall floors: every shipped approximate search clears its bar") {
    val measured = Seq(
      ("lsh_probe", meanRecall(Similarity.knnLshRecall(emb, 50, 3)), 0.40),
      // 4 tables x ~31-vector buckets = ~124 candidates/query vs
      // multiprobe's 155 at this fixture (p=4), so fixture recall sits
      // just below it (0.3800 measured round 11) — the tables path
      // earns its keep at corpus scale, where multiprobe's radius-1
      // recall decays with the ladder's p and L tables do not
      ("lsh_tables", meanRecall(Similarity.knnLshTablesRecall(emb, 50, 3, 4)), 0.33),
      ("ivf", meanRecall(Similarity.knnIvfRecall(emb, 50, 3, 2)), 0.35),
      ("ivfpq", meanRecall(Similarity.knnIvfPqRecall(emb, 50, 3, 2, 32)), 0.30),
      ("pq_trained",
        meanRecall(Similarity.knnPqTrainedRecall(emb, 50, 3, 32)), 0.50),
      ("pq_rerank",
        meanRecall(Similarity.knnPqRerankRecall(emb, 50, 3, 32)), 0.46),
      ("sq8", meanRecall(Similarity.knnSq8Recall(emb, 50, 3)), 0.88))
    measured.foreach { case (name, got, floor) =>
      info(f"$name%-11s recall@3 = $got%.4f (floor $floor)")
      assert(got >= floor,
        f"$name recall@3 regressed: $got%.4f < floor $floor")
    }
  }

  test("near-dup LSH keeps planted-variant recall at the ADAPTIVE planes setting") {
    // round-10 advisor: the adaptive ladder resolves to more planes
    // than the old fixed 4 on these fixtures, and more planes lowers
    // radius-1 multiprobe recall of the planted variant pairs — a
    // drop the ORACLE cannot see because it adapts in lockstep. Pin
    // the trade-off here: of the planted (base, base+offset) variant
    // pairs that truly clear cos >= 0.9 (exact all-pairs truth), the
    // bucketed path must keep finding its measured share.
    val exactVariant = Similarity.embeddingNearDup(emb, 0.9)
      .filter(col("id_b") === col("id_a") + Similarity.VariantIdOffset)
      .select("id_a", "id_b")
    val lshFound = Similarity.embeddingNearDupLsh(emb, 0.9)
      .select(col("id_a").as("fa"), col("id_b").as("fb"))
    val nTrue = exactVariant.count()
    val nHit = exactVariant.join(lshFound,
      col("id_a") === col("fa") && col("id_b") === col("fb"), "left_semi")
      .count()
    val recall = nHit.toDouble / nTrue
    // measured round 11: 0.4444 (16/36) at planesFor(200)=8 — vs
    // ~0.72 the old fixed 4 planes bought; that loss is the price of
    // the linear-at-scale candidate volume, now on the record
    info(f"planted-variant recall at adaptive planes = $recall%.4f ($nHit/$nTrue)")
    assert(nTrue > 0)
    assert(recall >= 0.40,
      f"adaptive-planes planted-variant recall regressed: $recall%.4f")
  }

  test("exact-truth sampling ladder: base fixtures resolve to stride 1, growth is log2") {
    // TruthSample is what keeps ns_embed_neardup / the simhash recall
    // gate linear past the base fixtures (round-10 verdict #2); these
    // integer boundaries are the whole contract
    assert(TruthSample.strideFor(200, Similarity.EmbedTruthCap) == 1)
    assert(TruthSample.strideFor(800, Similarity.EmbedTruthCap) == 1)
    assert(TruthSample.strideFor(1024, 1024) == 1)
    assert(TruthSample.strideFor(1025, 1024) == 2)
    assert(TruthSample.strideFor(8000, 1024) == 8)
    assert(TruthSample.strideFor(80000, 1024) == 128)
    assert(TruthSample.strideFor(500, Dedup.SimhashTruthCap) == 1)
    assert(TruthSample.strideFor(Long.MaxValue / 4, 1024) == (1L << 20))
    // stride 1 keeps EVERY id — the bit-identical-history guarantee
    val ids = spark.range(0, 1000).select(col("id"))
    assert(ids.filter(TruthSample.keep(col("id"), "t_", 1L)).count() == 1000)
    // and a power-of-two stride keeps ~1/stride of ids (hash-uniform)
    val kept = ids.filter(TruthSample.keep(col("id"), "t_", 8L)).count()
    assert(kept > 60 && kept < 190, s"stride-8 kept $kept of 1000")
  }

  test("quantizer-sizing ladders: fixture boundaries hold, growth is sqrt/constant-codebook") {
    // ivfStrideFor: cells ~ sqrt(n) past the 1024-vector fixture line;
    // the fixture stride 40 is load-bearing (every IVF oracle derives
    // identical centroids from it)
    assert(Similarity.ivfStrideFor(500) == 40)
    assert(Similarity.ivfStrideFor(1024) == 40)
    assert(Similarity.ivfStrideFor(1025) == 64)
    assert(Similarity.ivfStrideFor(4096) == 64)
    assert(Similarity.ivfStrideFor(200000) == 512) // the IvfProfile corpus
    assert(Similarity.ivfStrideFor(1L << 28) == (1L << 14))
    // pqStrideFor: codebook held at <= 256 codes/subspace past the
    // 4096-vector fixture line (fixed stride 25 reached 8,000 codes at
    // the 200k corpus — no longer an 8-bit code, 130 s to encode)
    assert(Similarity.pqStrideFor(2000) == 25)
    assert(Similarity.pqStrideFor(4096) == 25)
    assert(Similarity.pqStrideFor(4097) == 32)
    assert(Similarity.pqStrideFor(200000) == 1024)
    assert(200000 / Similarity.pqStrideFor(200000) <= Similarity.PqTargetCodes)
    // knnPlanesFor: constant ~32-vector bucket occupancy at any n
    assert(Similarity.knnPlanesFor(500) == 4)
    assert(Similarity.knnPlanesFor(2000) == 6)
    assert(Similarity.knnPlanesFor(200000) == 13)
    (1 to 10).foreach { e =>
      val n = math.pow(10, e).toLong
      val p = Similarity.knnPlanesFor(n)
      assert(p == 24 || n <= (Similarity.KnnTargetBucket << p))
    }
  }

  test("the untrained codebook is the negative control the floors catch") {
    // knnPqRecall quantizes against an UNTRAINED (data-split) codebook —
    // exactly the recall-killing mutation this suite exists to catch.
    // Its oracle is hash-green (ns_knn_pq_recall passes the driver), yet
    // it lands far below the trained floor: proof the gate discriminates
    // quality, not just parity.
    val untrained = meanRecall(Similarity.knnPqRecall(emb, 50, 3))
    info(f"untrained-codebook recall@3 = $untrained%.4f")
    assert(untrained < 0.50,
      "negative control unexpectedly cleared the trained floor — " +
        "either the floor is too low or the control is no longer broken")
    // and training must genuinely buy recall over not training
    val trained = meanRecall(Similarity.knnPqTrainedRecall(emb, 50, 3, 32))
    assert(trained > untrained + 0.2,
      f"training bought only ${trained - untrained}%.4f recall")
  }

  test("persisted IVF at 10x corpus: build + append + recall floor holds") {
    // 5,000 vectors = 10x the sf0.01 embeddings table, synthesized
    // in-plan with PLANTED cluster structure (250 clusters of 20):
    // vector = cluster center + 5% hash perturbation, so each
    // vector's true nearest neighbors are its cluster siblings and
    // recall measures whether the index keeps clusters inside probed
    // cells — the property that must survive corpus growth. Members
    // of cluster c are ids {c, c+250, ...}, so the appended quarter
    // (vec_id >= 4000) holds siblings of every query: the floor also
    // proves appended vectors are VISIBLE to probes (a silent append
    // bug would cost ~1/5 of every cluster and land far below it).
    val n = 5000L
    val nClusters = 250L
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(hash(pmod(col("id"), lit(nClusters)) * 64 + d), lit(1000))
          .cast("double") / 500.0 - 1.0) +
        (pmod(hash(col("id") * 64 + d + lit(7)), lit(1000))
          .cast("double") / 500.0 - 1.0) * 0.05).as("embedding"))
    // serving config: ~sqrt(n) cells, TrainPerCell-sized Lloyd sample
    val stride = math.round(math.sqrt(n.toDouble))
    val trainSample = (Similarity.TrainPerCell * (n / stride)).toInt
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q-ivf10x").toString
    val t0 = System.nanoTime()
    Similarity.ivfBuild(emb.filter(col("vec_id") < 4000), dir,
      stride, trainSample)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    Similarity.ivfAppend(emb.filter(col("vec_id") >= 4000), dir)
    val tAppend = (System.nanoTime() - t1) / 1e9
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 3
    val exact = Similarity.knnBruteForce(emb, 50, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.ivfQuery(queries, dir, k, 2)
      .select(col("query_id").as("aq"), col("neighbor_id").as("hit_id"))
    val recall = exact.join(approx,
        col("query_id") === col("aq") &&
          col("neighbor_id") === col("hit_id"), "left")
      .agg((count(col("hit_id")) / (lit(k) * countDistinct("query_id")))
        .as("recall")).head().getDouble(0)
    info(f"10x persisted IVF: build $tBuild%.2f s (4k vecs), " +
      f"append $tAppend%.2f s (1k vecs), recall@3 = $recall%.4f")
    assert(recall >= 0.80,
      f"10x persisted-index recall@3 regressed: $recall%.4f < 0.80")
  }

  test("simhash64 block-split recall: exhaustive below the block bound") {
    // 64 bits in 4 blocks: any pair within hamming <= 3 shares an
    // intact block (pigeonhole), so candidate generation is EXHAUSTIVE
    // there — recall must be exactly 1.0, not approximately
    val byHamming = Dedup.simhashWideRecall(docs)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    (0 to 3).foreach { h =>
      byHamming.get(h).foreach { rec =>
        assert(rec == 1.0, s"hamming=$h must be exhaustive, got $rec")
      }
    }
    // beyond the bound the multi-probe keeps recall high, not perfect
    // (round-7 measured: h=4 0.9524, h=5 0.7214)
    byHamming.get(4).foreach(rec => assert(rec >= 0.85, s"h=4: $rec"))
    byHamming.get(5).foreach(rec => assert(rec >= 0.60, s"h=5: $rec"))
    info(byHamming.toSeq.sorted.map { case (h, r) => s"h=$h:$r" }
      .mkString(" "))
  }

  test("HLL estimates sit inside the 1.04/sqrt(m) error band per source") {
    // m=256 registers: standard error 1.04/16 = 6.5%. The estimate is
    // deterministic (hash-seeded), so the band is a hard gate, not a
    // probabilistic one; 2 SE of headroom absorbs future fixture drift.
    val se = 1.04 / math.sqrt(Sketch.HllM)
    val rows = Sketch.hllDistinct(docs)
      .select(col("source"), col("rel_err")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = math.abs(r.getDouble(1))
      assert(err <= 2 * se,
        f"HLL rel_err for ${r.getString(0)}: $err%.4f > ${2 * se}%.4f")
    }
    val worst = rows.map(r => math.abs(r.getDouble(1))).max
    info(f"worst |rel_err| = $worst%.4f (band ${2 * se}%.4f, 1 SE = $se%.4f)")
  }

  test("CMS estimates only ever overestimate, and are exact for heavy keys") {
    val hh = Sketch.heavyHitters(docs, 20).collect()
    assert(hh.nonEmpty)
    hh.foreach { r =>
      val over = r.getLong(3)
      assert(over >= 0,
        s"CMS must never underestimate: token ${r.getString(0)} off by $over")
    }
    // with 4x16384 cells over this corpus the top-20 collide with
    // nothing material: the estimates are exact today — pin a loose
    // relative ceiling so real collision regressions surface
    hh.foreach { r =>
      assert(r.getLong(3) <= math.max(2L, r.getLong(2) / 100),
        s"heavy-hitter estimate drifted: ${r.getString(0)} " +
          s"est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via the alternating large-star /
  * small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi &
  * Vassilvitskii, "Connected Components in MapReduce and Beyond",
  * SoCC'14) — the adversarial-diameter upgrade over per-round label
  * propagation: label propagation needs O(diameter) rounds (a
  * 1000-link near-dup chain = 1000 shuffles), the star algorithm
  * contracts paths doubly-exponentially and converges in
  * O(log n) rounds regardless of diameter.
  *
  * Each round is two grouped aggregations + joins over the edge list
  * (shuffle O(|E|)), the same per-round cost as label propagation —
  * the win is purely in round count. Lineage is cut per round with
  * the same reliable-checkpoint policy as
  * [[Dedup.minhashClusters]].
  */
object Graph {

  /** One large-star step: every neighbor v of a center u with v > u
    * re-attaches to m = min(N(u) ∪ u). Input/output edges are
    * (src, dst) pairs, orientation irrelevant (bidirected internally).
    *
    * `dedup = false` skips the duplicate elimination — correct
    * whenever the output feeds an operator that is itself
    * duplicate-insensitive ([[smallStar]]'s min aggregate and final
    * distinct), and saves one wide shuffle of the full edge set per
    * round in the composed loop.
    */
  private[ops] def largeStar(edges: DataFrame, dedup: Boolean = true): DataFrame = {
    val bi = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val centerMin = bi.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    val out = bi.join(centerMin, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
    if (dedup) out.distinct() else out
  }

  /** One small-star step: every smaller neighbor (and the center)
    * attaches to the center's minimum neighbor. Output edges are
    * oriented larger -> smaller.
    */
  private[ops] def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val centerMin = dir.groupBy("src").agg(min("dst").as("m"))
    val reattached = dir.join(centerMin, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val own = centerMin.select(col("src"), col("m").as("dst"))
    reattached.unionByName(own).distinct()
  }

  private def iterCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Connected components of an undirected edge list (`src`, `dst`
    * long columns). Returns ((id, label) frame over every node that
    * appears in an edge, rounds used). Convergence is detected by an
    * edge-set fingerprint (count + two independent hash sums) — an
    * O(1)-state aggregate, not a distributed set compare.
    */
  def ccStar(edges0: DataFrame, maxIter: Int = 25): (DataFrame, Int) = {
    val sc = edges0.sparkSession.sparkContext
    // Round-block rotation: a localCheckpoint parks its blocks in the
    // executors until the ContextCleaner gets a driver GC — in a
    // long-lived session every superseded round LEAKS its blocks
    // (observed shifting minutes of eviction pressure onto unrelated
    // queries in a 217-query JVM). Snapshot getPersistentRDDs around
    // each round's cut and explicitly unpersist the PREVIOUS round
    // once the new one is materialized; only ids created by this loop
    // are ever touched, so concurrent jobs are unaffected.
    var priorIds: Set[Int] = Set.empty
    def rotateTo(created: Set[Int]): Unit = {
      priorIds.foreach(id => sc.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))
      priorIds = created
    }
    // materialize the input edge list ONCE — the contraction below
    // reads it three times (neighborhood minima + both relabel joins),
    // and without the cut each read would re-run the whole upstream
    // pipeline (e.g. the LSH candidate generation)
    val beforeBase = sc.getPersistentRDDs.keySet.toSet
    val base = iterCheckpoint(
      edges0.select(col("src"), col("dst")).filter(col("src") =!= col("dst")))
    val baseIds = sc.getPersistentRDDs.keySet.toSet -- beforeBase
    // PRE-CONTRACTION (round-11 verdict #1, "hash-to-min" pass): map
    // every node u to m(u) = min(N(u) ∪ u) and rewrite each edge
    // (u, v) as (m(u), m(v)), dropping self-loops. Every original
    // edge maps to a contracted edge between the same components, so
    // connectivity is preserved exactly — and any component whose
    // nodes all agree on m (every star, every diameter-<=2 cluster,
    // i.e. almost all of a near-dup graph) vanishes from the edge set
    // entirely before the star loop starts. At mult=100 this cuts the
    // iterated edge set from ~1.2M to a few thousand rows, so the
    // O(log n) star rounds — the query's sequential, driver-GC-
    // sensitive stretch — run on KB-scale data. If the contracted set
    // collapses to empty, m IS the component-min labeling (proof: all
    // self-loops means m is constant per component, and the component
    // min w has m(w) = w).
    val bi0 = base.unionByName(
      base.select(col("dst").as("src"), col("src").as("dst")))
    // m survives the whole loop (the final labels compose through it):
    // keep it out of the round rotation
    val m = iterCheckpoint(bi0.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("m")))
    val mSrc = m.select(col("id").as("src"), col("m").as("msrc"))
    val mDst = m.select(col("id").as("dst"), col("m").as("mdst"))
    val before0 = sc.getPersistentRDDs.keySet.toSet
    var edges = iterCheckpoint(base
      .join(mSrc, "src").join(mDst, "dst")
      .select(col("msrc").as("src"), col("mdst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    rotateTo(sc.getPersistentRDDs.keySet.toSet -- before0)
    // base fed only the contraction; its blocks are dead now that the
    // contracted set is materialized (m stays — the final labels
    // compose through it)
    baseIds.foreach(id => sc.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      // hashes reduced mod ~1e9 before summing: ANSI-overflow-safe up
      // to ~9e9 edges per fingerprint
      val r = e.agg(
        count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("src"), col("dst")), lit(1000000007L))),
          lit(0L)),
        coalesce(sum(pmod(xxhash64(col("dst"), col("src")), lit(998244353L))),
          lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val reliable =
      edges0.sparkSession.sparkContext.getCheckpointDir.isDefined
    // seed with the contracted set's own fingerprint (one cheap job
    // over the just-materialized checkpoint): an already-converged —
    // in particular EMPTY — contracted set then skips the loop after
    // one no-op round instead of two
    var fp = fingerprint(edges)
    var rounds = 0
    var converged = fp._1 == 0L
    while (!converged && rounds < maxIter) {
      val stepped = smallStar(largeStar(edges, dedup = false))
      // Per-round lineage policy: in local mode the cut is a LAZY
      // localCheckpoint, so the convergence fingerprint below is the
      // ONE Spark job that also materializes the round (the eager
      // cut + separate fingerprint job doubled per-round scheduler
      // overhead). With a reliable checkpoint dir — a real cluster —
      // the round stays eagerly checkpointed: the fingerprint then
      // reads checkpoint files (cheap second job), and every round
      // remains recoverable if an executor dies mid-iteration.
      val before = sc.getPersistentRDDs.keySet.toSet
      edges = if (reliable) stepped.checkpoint(true)
              else stepped.localCheckpoint(false)
      val next = fingerprint(edges)
      // the fingerprint materialized this round's blocks; the previous
      // round's are now unreachable by any future job — drop them
      rotateTo(sc.getPersistentRDDs.keySet.toSet -- before)
      converged = next == fp
      fp = next
      rounds += 1
    }
    // at the fixpoint the edge set is a union of stars rooted at each
    // component's minimum: every non-root points straight at its root
    val loopLabels = edges
      .select(col("src").as("id"), col("dst").as("label"))
      .unionByName(edges.select(col("dst").as("id"), col("dst").as("label")))
      .groupBy("id").agg(min("label").as("label"))
    // compose back through the contraction: label(u) = L(m(u)) when
    // m(u) survived into the contracted graph, else m(u) itself (its
    // component fully collapsed, so m(u) is the component min)
    val labels = m.join(loopLabels, m("m") === loopLabels("id"), "left")
      .select(m("id"), coalesce(loopLabels("label"), m("m")).as("label"))
    (labels, rounds)
  }

  /** [[Dedup.minhashClusters]] with star-contraction components —
    * identical output (shares the recursive-CTE oracle), but the
    * round count is O(log n) in the worst case instead of
    * O(cluster diameter), which is what survives an adversarial
    * version-drift chain at 100 TB.
    */
  def minhashClustersStar(docs: DataFrame, minSim: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, minSim)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val (labels, _) = ccStar(pairs)
    labels.groupBy("label")
      .agg(count(lit(1)).as("cluster_size"),
        min(col("id")).as("canonical_id"))
      .select(col("canonical_id"), col("cluster_size"))
      .orderBy("canonical_id")
  }
}

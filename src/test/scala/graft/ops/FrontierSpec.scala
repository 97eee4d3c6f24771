package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-12 frontier rewrite of [[Dedup.minhashClusters]] shipped
  * with only happy-path coverage (round-12 verdict #3): round 1 is a
  * full fused round, so a fixture whose near-dup graph is a CHAIN in
  * id space is the only way to force rounds >= 2 — the delta joins,
  * the lazy broadcast-merge label stack, and (with the gate shrunk to
  * zero) the shuffled-join fallback all run for real. Expected labels
  * come from a driver-side union-find over the SAME pair list the
  * cluster op consumes, and [[Graph.minhashClustersStar]] must agree
  * (the two share the recursive-CTE oracle).
  */
class FrontierSpec extends SparkSpec {

  /** Sliding-window docs over one long distinct-token sequence: doc i
    * overlaps doc i+1 enough for an LSH edge, doc i+2 too little —
    * the pair graph is (approximately; asserted below) a path with
    * ids ascending along it, the worst case for min-label rounds.
    */
  private def chainDocs(n: Int, window: Int = 40, stride: Int = 8) = {
    import spark.implicits._
    val words = (0 until (n * stride + window + 8)).map(i => s"w$i")
    (1 to n).map { i =>
      val off = (i - 1) * stride
      (i.toLong, words.slice(off, off + window).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def unionFind(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  /** (canonical_id, cluster_size) rows expected from a labeling. */
  private def expectedClusters(labels: Map[Long, Long]): Set[(Long, Long)] =
    labels.groupBy(_._2).map { case (_, m) =>
      (m.keys.min, m.size.toLong)
    }.toSet

  private def collected(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Hops from each node to its component's min id, walking the pair
    * graph — a lower bound on the frontier rounds the loop must run
    * (round r can move a label at most r hops from its source).
    */
  private def minLabelDistance(edges: Seq[(Long, Long)], nodes: Seq[Long]): Int = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val comps = unionFind(edges, nodes).groupBy(_._2).values.map(_.keys.toSet)
    comps.map { comp =>
      val root = comp.min
      var dist = Map(root -> 0)
      var frontier = Set(root)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .intersect(comp) -- dist.keySet
        next.foreach(n => dist += n -> (dist(frontier.head) + 1))
        frontier = next
      }
      dist.values.max
    }.max
  }

  test("multi-round frontier: chain fixture agrees with union-find and ccStar") {
    val docs = chainDocs(6)
    val pairs = Dedup.minhashLsh(docs, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // the fixture is only a frontier test if labels must travel >= 3
    // hops — i.e. the loop needs >= 2 delta rounds after the fused
    // round 1 (which moves labels 1 hop)
    assert(minLabelDistance(pairs, nodes) >= 3,
      s"fixture too clustered to force multi-round frontier: $pairs")
    val want = expectedClusters(unionFind(pairs, nodes))
    assert(collected(Dedup.minhashClusters(docs, 0.5)) == want)
    assert(collected(Graph.minhashClustersStar(docs, 0.5)) == want)
  }

  test("shuffled fallback (gate=0) produces identical clusters") {
    val docs = chainDocs(6)
    val baseline = collected(Dedup.minhashClusters(docs, 0.5))
    spark.conf.set("spark.graft.frontierBroadcastRows", "0")
    try {
      val fallback = collected(Dedup.minhashClusters(docs, 0.5))
      assert(fallback == baseline,
        "shuffled-join fallback must match the broadcast path")
    } finally spark.conf.unset("spark.graft.frontierBroadcastRows")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Harmonic centrality by data-parallel multi-source BFS: every node is
  * simultaneously a BFS source, the frontier is a (src, node) pair set,
  * and h(u) = Σ_{v ≠ u, reachable} 1/d(u, v) — the closeness variant
  * that handles disconnected graphs gracefully (unreachable pairs
  * contribute 0 instead of poisoning the mean; Boldi & Vigna 2014 argue
  * it is the axiomatically sound choice).
  *
  * Scale contract: the visited state is the REACHABLE PAIR set — Θ(V²)
  * on a connected graph. This is inherent to exact all-sources
  * centrality, not an implementation artifact; the operator targets
  * contracted/analytics graphs (the ≤ |nations|² trade net, cluster
  * summaries), and for corpus-scale graphs the standard move is to run
  * the same frontier loop from a SAMPLED source set (the
  * pivot/HyperBall family) — the `sources` parameter takes that subset.
  * Per round: one join frontier⋈neighbors, one distinct, one anti join
  * against visited — all key-partitioned; per-round lineage cut via
  * [[Components.cutCounted]], whose count is the termination scalar
  * (the Bfs contract). Rounds are bounded by `maxHops` with early exit,
  * so a serial replay bounded at the same depth matches exactly.
  */
object Harmonic {

  /** Node-count bound above which an implicit all-sources run switches to
    * the sampled-pivot estimator — exact Θ(V²) pair state must be an
    * EXPLICIT choice (pass `sources` = all nodes) on large graphs, never
    * the silent default.
    */
  val MaxExactNodes = 4096L

  /** Pivot count for the sampled estimator (Eppstein–Wang / pivot family:
    * ĥ(v) = ((n−1)/m)·Σ_{p∈S} 1/d(p,v), error O(1/√m) relative to the
    * node count).
    */
  val SamplePivots = 256

  /** (node, n_reached, harmonic) per source node, harmonic rounded at
    * 12 dp from fixed-point 1/d sums. `und`: undirected edges (uCol <
    * vCol, deduplicated). `sources`: optional one-column frame limiting
    * the BFS sources; None = every node when |V| ≤ `maxExactNodes`,
    * otherwise the deterministic sampled-pivot ESTIMATOR (BFS from the
    * `SamplePivots` nodes with smallest xxhash64, per-node estimate
    * scaled by (n−1)/m over distances TO the pivots — exact d(p,v) by
    * undirected symmetry; n_reached = pivots reaching v).
    */
  def run(und: DataFrame, uCol: String = "u", vCol: String = "v",
      maxHops: Int = 8, sources: Option[DataFrame] = None,
      maxExactNodes: Long = MaxExactNodes): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val nb = und.select(col(uCol).as("node"), col(vCol).as("nbr"))
      .unionByName(und.select(col(vCol).as("node"), col(uCol).as("nbr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allNodes = nb.select("node").distinct()
    var sampledN = -1L // > 0 ⇒ pivot-estimator mode, value = |V|
    val srcs = sources match {
      case None =>
        val nCount = allNodes.count()
        if (nCount <= maxExactNodes) allNodes
        else {
          sampledN = nCount
          // deterministic pivots: the m smallest (hash, node) — seeded by
          // the hash function itself, stable across runs and partitions
          allNodes.orderBy(xxhash64(col("node")), col("node")).limit(SamplePivots)
        }
      case Some(sd) =>
        sd.select(col(sd.columns.head).as("node")).distinct().join(allNodes, "node")
    }
    var visited = Components.cut(
      srcs.select(col("node").as("src"), col("node"), lit(0).as("dist")), None)
    var frontier = visited
    var hop = 0
    var done = false
    try {
      while (hop < maxHops && !done) {
        hop += 1
        val (next, n) = Components.cutCounted(
          frontier.join(nb, "node")
            .select(col("src"), col("nbr").as("node"), lit(hop).as("dist"))
            .distinct()
            .join(visited.select("src", "node"), Seq("src", "node"), "left_anti"),
          None)
        if (n == 0) done = true
        else {
          visited = Components.cut(visited.unionByName(next), None)
          frontier = next
        }
      }
      if (sampledN > 0) {
        // pivot estimator: aggregate by DESTINATION — d(p,v) = d(v,p) on
        // an undirected graph — and scale by (n−1)/m
        val scale = (sampledN - 1).toDouble / SamplePivots.toDouble
        visited
          .filter(col("dist") > 0)
          .groupBy(col("node"))
          .agg(
            count(lit(1)).as("n_reached"),
            round(lit(scale) * graft.functions.Exact.sumFx(
              lit(1.0) / col("dist").cast("double"), 15), 12).as("harmonic"))
      } else
        visited
          .filter(col("dist") > 0)
          .groupBy(col("src").as("node"))
          .agg(
            count(lit(1)).as("n_reached"),
            round(graft.functions.Exact.sumFx(
              lit(1.0) / col("dist").cast("double"), 15), 12).as("harmonic"))
    } finally {
      nb.unpersist()
    }
  }
}

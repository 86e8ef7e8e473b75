package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS (hop counts) over an edge-list DataFrame — the
  * frontier-expansion form of Pregel BFS: each round joins the current
  * frontier against the adjacency list (one shuffle on the node key),
  * anti-joins out already-visited nodes, and stamps the new nodes with the
  * round number. Termination is data-driven (empty frontier), not
  * fixed-round: the loop runs diameter-many rounds, each a bounded
  * driver scalar (`count` of the new frontier) — never per-node driver
  * state.
  *
  * Scale shape: per round ONE join (frontier ⋈ edges; the frontier is the
  * small side and AQE broadcasts it while it fits) + one distinct + one
  * anti-join against the visited set (shuffle on node). Every round's
  * frontier is cut through [[Components.cut]] (reliable under
  * `checkpointDir`), so the plan tree never accretes across rounds; the
  * visited set is a lazy union of ALREADY-MATERIALIZED per-round frames,
  * which keeps each round's write O(frontier), not O(visited).
  *
  * `maxHops` is a safety contract, not a tuning knob: nodes farther than
  * `maxHops` from the source are reported as unreachable (use diameter
  * bounds you can defend; the default 64 exceeds any social/similarity
  * graph's diameter).
  */
object Bfs {

  /** (node, hop) for every node reachable from `source` within `maxHops`,
    * hop = BFS distance (source itself at hop 0).
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String, source: Long,
      maxHops: Int = 64, undirected: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = edges.sparkSession
    val e0 = edges.select(
      col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    val adj = (if (undirected) e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      else e0)
      .filter(col("s") =!= col("d"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = Components.cut(
      spark.createDataFrame(Seq(Tuple2(source, 0L))).toDF("node", "hop"),
      checkpointDir)
    var visited = seed // lazy union of cut frames — each already materialized
    var frontier = seed
    var hop = 0L
    var expanding = true
    while (expanding && hop < maxHops) {
      hop += 1
      // the cut's materialization count doubles as the termination probe —
      // no separate isEmpty job per round
      val (next, n) = Components.cutCounted(
        frontier.join(adj, frontier("node") === adj("s"))
          .select(col("d").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("hop", lit(hop)),
        checkpointDir)
      if (n == 0) expanding = false
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    adj.unpersist() // frames are materialized cuts; nothing recomputes adj
    visited
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — turns near-dup PAIRS (from
  * [[NearDup]]) into dedup CLUSTERS (transitive closure), so "keep one doc
  * per duplicate group" is well-defined even when A~B, B~C but A≁C.
  *
  * Algorithm: min-label propagation — every node starts labeled with its
  * own id; each round every node takes the min of its own and its
  * neighbors' labels; converged when nothing changes. Rounds ≤ graph
  * diameter, and near-dup graphs are unions of small dense blobs
  * (diameter ~2-3), so 3-5 rounds close them. Each round is one
  * join + groupBy shuffle on the edge list; lineage is cut per round with
  * `localCheckpoint` so the plan doesn't grow (at cluster scale use
  * `checkpoint` to reliable storage; the large-star/small-star algorithm
  * of Kiveris et al. is the drop-in upgrade if diameters ever get large).
  */
object Components {

  /** (id, cluster_id) for every node appearing in `pairs`, cluster_id =
    * min node id of the component.
    */
  def connectedComponents(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame = {
    // no cast: the algorithm only needs an orderable id type, and casting
    // would silently null non-numeric ids
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    def propagate(ls: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(ls.select(col("id").as("dst"), col("label").as("nbr_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nbr_label").as("nbr_label"))
      ls.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // two hops per materialization: halves the checkpoint/convergence-
      // check job count (label propagation converges in O(diameter) hops).
      // The intermediate hop is cached — it feeds both the second hop's
      // aggregation and its final join, and would otherwise recompute.
      val mid = propagate(labels).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = propagate(mid)
        .withColumnRenamed("label", "new_label")
        .join(labels, "id")
        .select(col("id"), col("label").as("old_label"), col("new_label").as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("old_label")).count()
      mid.unpersist()
      labels = next.select("id", "label")
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Cluster assignment for near-duplicate documents plus the survivor
    * flag (lowest doc_id in each cluster survives — the cross-document
    * generalization of [[Dedup.firstWriterWins]]).
    */
  def neardupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_survivor"))
}

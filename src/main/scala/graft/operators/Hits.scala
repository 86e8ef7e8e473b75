package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** HITS (hubs and authorities) over an edge-list DataFrame — the
  * complement to [[PageRank]]: authority scores reward being pointed at
  * by good hubs, hub scores reward pointing at good authorities
  * (Kleinberg's algorithm, L1-normalized per half-step).
  *
  * Round k (the classic ordering — authorities from the k−1 hubs, then
  * hubs from the FRESH authorities):
  *   a'(v) = Σ_{u→v} w(u,v)·h(u),  a = round(a'/‖a'‖₁, 12)
  *   h'(u) = Σ_{u→v} w(u,v)·a(v),  h = round(h'/‖h'‖₁, 12)
  *
  * Scale/determinism contract is [[PageRank]]'s: each half-step is one
  * shuffle join (scores ⋈ edges) + one hash aggregate; per-edge products
  * round at 15 dp and accumulate as DECIMAL(38,15) (associative ⇒
  * partition-order free); the L1 norm is the decimal sum of the rounded
  * scores kept in-plan via broadcast crossJoin; lineage is cut every
  * round (the round plan reads the previous scores multiple times — an
  * uncut tree grows geometrically, see PageRank's note), reliably on the
  * `checkpointEvery` cadence when `checkpointDir` is given.
  */
object Hits {

  /** (node, authority, hub) for every node of `edges`, both columns
    * L1-normalized and rounded at 12 dp.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")

    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble

    def l1Normalize(scores: DataFrame, c: String): DataFrame = {
      val norm = scores.agg(
        sum(col(c).cast(DecimalType(38, 15))).cast("double").as("__l1"))
      scores.crossJoin(broadcast(norm))
        .select(col("node"), round(col(c) / col("__l1"), 12).as(c))
    }

    var scores = nodes.select(col("node"),
      round(lit(1.0) / n, 12).as("auth"), round(lit(1.0) / n, 12).as("hub"))
    try {
      for (i <- 1 to iterations) {
        // authorities from current hubs
        val aRaw = scores.select(col("node"), col("hub"))
          .join(e, col("node") === col("src"))
          .select(col("dst").as("node"),
            round(col("hub") * col("w"), 15).cast(DecimalType(38, 15)).as("c"))
          .groupBy("node")
          .agg(sum(col("c")).cast("double").as("a_raw"))
        // cut BEFORE normalizing: the L1 norm reads its input twice (the
        // norm aggregate + the normalized select) and the fresh
        // authorities are read twice more below (hub contributions, the
        // final join) — uncut, every reader re-executes the half-step
        // join+agg and each round costs 3 redundant jobs
        val aPre = Components.cut(
          nodes.join(aRaw, Seq("node"), "left")
            .select(col("node"), coalesce(col("a_raw"), lit(0.0)).as("auth")),
          None)
        val a = l1Normalize(aPre, "auth")
        // hubs from the fresh authorities
        val hRaw = a
          .join(e, col("node") === col("dst"))
          .select(col("src").as("node"),
            round(col("auth") * col("w"), 15).cast(DecimalType(38, 15)).as("c"))
          .groupBy("node")
          .agg(sum(col("c")).cast("double").as("h_raw"))
        val hPre = Components.cut(
          nodes.join(hRaw, Seq("node"), "left")
            .select(col("node"), coalesce(col("h_raw"), lit(0.0)).as("hub")),
          None)
        val h = l1Normalize(hPre, "hub")
        scores = Components.cut(
          a.join(h, "node"),
          if (i % checkpointEvery == 0 || i == iterations) checkpointDir else None)
      }
      scores
    } finally {
      e.unpersist()
      nodes.unpersist()
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Differential pin for [[graft.operators.BeamAnn]] (round 13): the
  * driver replay must be bit-identical to the distributed rounds —
  * same beam membership under the (cos DESC, node ASC) order, same
  * 12 dp Spark-Round cosines from the scale-20 decimal dot contract,
  * same final top-k after self-exclusion.
  */
class BeamAnnSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic float vectors: id i gets a slightly rotated pattern so
    * cosines are distinct but clustered; ids close together are similar.
    */
  private def corpus(n: Int, dim: Int) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (math.sin(0.7 * (i % 7) + 0.13 * d) + 0.01 * i).toFloat).toSeq)
    }.toDF("vec_id", "embedding")

  /** knn edges by exact cosine would need the operator under test; a fixed
    * synthetic out-degree-3 ring graph is enough to exercise multi-hop
    * expansion, dead ends and revisits.
    */
  private def ring(n: Int) =
    (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong),
        (i.toLong, ((i + 3) % n).toLong),
        (i.toLong, ((i * 2 + 1) % n).toLong))
    }.toDF("src", "dst")

  test("beam search: driver replay is bit-identical to the distributed rounds") {
    val emb = corpus(60, 8)
    val e = ring(60)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val before = graft.operators.BeamAnn.driverPathRuns.get()
    val replay = rows(graft.operators.BeamAnn.searchTopK(
      emb, e, maxQueryId = 5, width = 4, hops = 6, k = 3))
    assert(graft.operators.BeamAnn.driverPathRuns.get() === before + 1,
      "sub-threshold corpus must take the driver replay")
    val dist = rows(graft.operators.BeamAnn.searchTopK(
      emb, e, maxQueryId = 5, width = 4, hops = 6, k = 3,
      driverRowThreshold = 0))
    assert(graft.operators.BeamAnn.driverPathRuns.get() === before + 1,
      "threshold 0 must force the distributed rounds")
    assert(replay.size === dist.size)
    replay.zip(dist).foreach { case (a, b) =>
      assert(a._1 === b._1 && a._2 === b._2 && a._3 === b._3, s"$a vs $b")
      assert(java.lang.Double.compare(a._4, b._4) === 0, s"cos of $a vs $b")
    }
    // sanity: every query emitted k rows and never its own node
    assert(replay.map(_._1).distinct.size === 5)
    assert(replay.forall { case (q, _, n, _) => q != n })
  }
}

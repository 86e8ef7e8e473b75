package graft

import graft.operators.KMeans

/** Lloyd's k-means: blob recovery, determinism under repartitioning, and
  * the empty-cluster keep-previous path.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def blob(ids: Range, base: Float): Seq[(Long, Array[Float])] =
    ids.map(i => (i.toLong, Array(base + i % 3 * 0.1f, base, base - i % 2 * 0.1f, base)))

  test("two separated blobs are recovered exactly; repartitioning changes nothing") {
    val vecs = (blob(0 until 10, 0.0f) ++ blob(10 until 20, 10.0f))
      .toDF("vec_id", "embedding")
    val out = KMeans.run(vecs, k = 2, iterations = 3, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = out.groupBy(_._2).map { case (c, m) => c -> m.keys.toSet }
    assert(clusters.values.toSet === Set((0L until 10L).toSet, (10L until 20L).toSet),
      s"blobs split wrong: $clusters")
    val re = KMeans.run(vecs.repartition(13), k = 2, iterations = 3, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === out)
  }

  test("an emptied cluster keeps its previous centroid instead of erroring") {
    // two tight blobs, k = 3: one seed loses every point after round 1
    // and must survive as an empty cluster through the remaining rounds
    val vecs = (blob(0 until 12, 0.0f) ++ blob(12 until 24, 50.0f))
      .toDF("vec_id", "embedding")
    val out = KMeans.run(vecs, k = 3, iterations = 4, seed = 2L).collect()
    assert(out.length === 24)
    assert(out.map(_.getLong(1)).distinct.length <= 3)
  }
}

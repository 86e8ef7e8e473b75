package graft

import org.apache.spark.sql.functions._

/** Hand ground truths for the round-7 graph/eval additions: harmonic
  * centrality (q157) and nearest-centroid evaluation (q159). TextRank
  * (q158) composes the PageRankSpec-pinned operator with the
  * q109-pinned pair extraction; its end-to-end grading is the oracle.
  */
class GraphExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("harmonic centrality on a path graph: exact 1/d sums") {
    // path 1-2-3-4: h(1) = 1 + 1/2 + 1/3; h(2) = 1 + 1 + 1/2
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val h = graft.operators.Harmonic.run(und).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(h(1L)._1 === 3L)
    assert(math.abs(h(1L)._2 - (1.0 + 0.5 + 1.0 / 3)) < 1e-9)
    assert(math.abs(h(2L)._2 - 2.5) < 1e-9)
    assert(h(1L)._2 === h(4L)._2 && h(2L)._2 === h(3L)._2) // symmetry
  }

  test("harmonic centrality: disconnected components never meet; maxHops truncates") {
    val und = Seq((1L, 2L), (10L, 11L)).toDF("u", "v")
    val h = graft.operators.Harmonic.run(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.values.forall(_ === 1L), h.toString) // each reaches only its pair
    // a 5-path with maxHops=1 sees only direct neighbors
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val h1 = graft.operators.Harmonic.run(path, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1(1L) === 1L && h1(3L) === 2L)
  }

  test("harmonic centrality: sampled-sources path restricts rows, not reachability") {
    val und = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val h = graft.operators.Harmonic.run(
      und, sources = Some(Seq(1L, 99L).toDF("node"))).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h.keySet === Set(1L)) // 99 is off-graph, 2 and 3 not sampled
    assert(math.abs(h(1L) - 1.5) < 1e-9)
  }

  test("nearest-centroid eval: separable blobs score perfect per-label F1") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.Registry.byName("q159_nearest_centroid_eval")
    // drive the inline query body through a parquet round trip
    val dir = tmpDir("graft_nce")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = out.run(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("precision") === 1.0, r.toString)
      assert(r.getAs[Double]("recall") === 1.0, r.toString)
      assert(r.getAs[Double]("f1") === 1.0, r.toString)
    }
  }
}

package graft

import graft.queries.SimilarityQueries

class CentroidCosineSpec extends SparkSpec {
  import spark.implicits._

  test("centroid cosine matrix: orthogonal, parallel, and averaged cases") {
    // label 0: two vecs averaging to (1, 0); label 1: (0, 1) — orthogonal;
    // label 2: (2, 0) — parallel to label 0's centroid (cosine 1 despite
    // the different norm); label 3: (1, 1) — 45° from both axes.
    val emb = Seq(
      (0L, Array(2.0f, 0.0f), 0), (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(2.0f, 0.0f), 2),
      (4L, Array(1.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.centroidCosineMatrix(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 1)) === 0.0)
    assert(got((0, 2)) === 1.0)
    assert(got((1, 2)) === 0.0)
    val c45 = math.sqrt(2) / 2
    assert(math.abs(got((0, 3)) - c45) < 1e-9)
    assert(math.abs(got((1, 3)) - c45) < 1e-9)
    // full upper triangle, nothing else
    assert(got.size === 6)
  }
}

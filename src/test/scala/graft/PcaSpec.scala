package graft

import graft.operators.Pca

/** Ground truths for the PCA operator (q138) and the q137 standardization
  * contract.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def cloud = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)),
    (3L, Array(0.0f, 2.0f)), (4L, Array(0.0f, -2.0f)))
    .toDF("vec_id", "embedding")

  test("covariance: hand-computed 2-d matrix") {
    // means (0,0); C = [[2/4, 0], [0, 8/4]] = [[0.5, 0], [0, 2.0]]
    val c = Pca.covariance(cloud)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(c((0, 0)) === 0.5)
    assert(c((1, 1)) === 2.0)
    assert(c((0, 1)) === 0.0 && c((1, 0)) === 0.0)
    assert(c.size === 4)
  }

  test("topComponent: dominant axis, unit norm, canonical sign") {
    val v = Pca.topComponent(Pca.covariance(cloud))
    // variance along dim 1 (2.0) dominates dim 0 (0.5)
    assert(math.abs(v(1)) > 0.999, v.mkString(","))
    assert(math.abs(v(0)) < 1e-3, v.mkString(","))
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6)
    // sign convention: first non-tiny component positive
    assert(v.find(math.abs(_) > 1e-9).get > 0)
  }

  test("covariance: bit-identical across partition counts (exact buffer merge)") {
    // the native CovOuterSumAgg's decimal partials must make the cell sums
    // partition-order free — the same contract the old DECIMAL(38,15) SQL
    // sum carried
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def cells(parts: Int) = Pca.covariance(emb.repartition(parts))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val one = cells(1)
    val many = cells(13)
    assert(one.keySet === many.keySet)
    one.foreach { case (k, v) => assert(java.lang.Double.compare(v, many(k)) === 0, s"cell $k") }
  }

  test("topComponent: eigen residual is small on the real sf0.001 embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = Pca.covariance(emb).collect()
    val d = cells.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Double](d, d)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val v = Pca.topComponent(Pca.covariance(emb))
    val cv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => v(i) * cv(i)).sum
    val resid = (0 until d).map(i => math.abs(cv(i) - lambda * v(i))).max
    assert(lambda > 0, s"lambda=$lambda")
    assert(resid / lambda < 1e-6, s"resid=$resid lambda=$lambda")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PCA over an embedding column — covariance by ONE narrow pass, top
  * principal component by power iteration on the driver.
  *
  * Covariance: each row's upper-triangle outer products are accumulated
  * IN the row by one native aggregate ([[graft.expressions
  * .CovOuterSumAgg]] — no join, no per-product row explosion, no shuffle
  * beyond the final ≤ d²-cell merge) with products quantized at 15
  * digits into exact 128-bit fixed-point partials, so the sums are
  * partition-order independent and a serial engine replays them
  * bit-for-bit. Shuffle volume is O(partitions · d²), not O(rows · d²).
  *
  * Power iteration: the collected matrix is d² doubles — BOUNDED driver
  * state (4096 cells at d = 64; the same bounded-collect contract as the
  * ≤16k ANN training samples), then a few hundred d²-flop iterations.
  * Determinism: the matrix is rounded (12 dp) before collect, the init
  * vector is uniform 1/√d, the iteration count is fixed, and the sign is
  * canonicalized (first component with |v| > 1e-9 made positive —
  * eigenvectors are sign-ambiguous). NOT run per-partition or per-group:
  * one matrix per corpus.
  */
object Pca {

  /** Covariance cells (i, j, c) — d² rows, c = round(S_ij/n − m_i·m_j, 12)
    * with fixed-point-exact S and decimal-exact m. Population (1/n)
    * normalization.
    */
  def covariance(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val e = col(vecCol)
    // upper triangle in ONE native aggregate pass
    // ([[graft.expressions.CovOuterSumAgg]] — 128-bit fixed-point cell
    // sums, no d² interpreted lambda evaluations or decimal allocations
    // per row), mirrored afterwards: the per-row product set is
    // symmetric (x_i·x_j = x_j·x_i bit-exactly)
    val aggCol = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.CovOuterSumAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(
          e.cast("array<double>"))).toAggregateExpression())
    val sUpper = emb.agg(aggCol.as("cells"))
      .select(explode(col("cells")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"),
        col("t.s").cast("double").as("s"), col("t.n").cast("double").as("n"))
    val s = sUpper.unionByName(
      sUpper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("s"), col("n")))
    val means = emb.select(
      posexplode(e).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(round(col("x").cast("double"), 15).cast(DecimalType(38, 15)))
        .cast("double") / count(lit(1))).as("m"))
    s
      .join(broadcast(means.select(col("i"), col("m").as("mi"))), "i")
      .join(broadcast(means.select(col("i").as("j"), col("m").as("mj"))), "j")
      .select(col("i"), col("j"),
        round(col("s") / col("n") - col("mi") * col("mj"), 12).as("c"))
  }

  /** Top eigenvector of the covariance cells by `iters` power iterations,
    * components rounded at 9 dp, sign canonicalized. `cells` must be the
    * [[covariance]] output (d² rows).
    */
  def topComponent(cells: DataFrame, iters: Int = 200): Array[Double] = {
    val rows = cells.select("i", "j", "c").collect() // bounded: d² cells
    val d = rows.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      val nrm = math.sqrt(u.map(x => x * x).sum)
      if (nrm > 0) v = u.map(_ / nrm)
    }
    val sign = v.find(math.abs(_) > 1e-9).map(x => math.signum(x)).getOrElse(1.0)
    v.map(x => BigDecimal(x * sign).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}

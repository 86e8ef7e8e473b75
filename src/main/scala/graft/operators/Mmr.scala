package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998)
  * over precomputed shortlists — the diversifying rerank between a
  * retrieval shortlist and the result page: greedily pick the candidate
  * maximizing λ·rel − (1−λ)·max-sim-to-already-selected.
  *
  * The loop is inherently sequential in k, but each step is
  * data-parallel ACROSS queries and all state is shortlist-bounded
  * (candidates and their pairwise sims), so the k unrolled steps cost
  * one anti join + one bounded max-aggregate + one per-query argmax
  * window each — independent of corpus size. Determinism contract:
  * `rel` and `sim` must arrive pre-rounded (the caller's 12-dp
  * contract); each step's score rounds at 12 and argmax ties break on
  * the smaller candidate id, so a serial replay picks identical sets.
  */
object Mmr {

  /** Select `k` per query. `short`: (qCol, cCol, rel). `sims`:
    * (qCol, cCol, mCol, sim) — pairwise sims among each query's
    * shortlist, both directions. Output: (qCol, step, cCol, rel, mmr),
    * step 1-based in selection order; queries with fewer than k
    * candidates simply stop early.
    */
  def select(short: DataFrame, sims: DataFrame, lambda: Double, k: Int,
      qCol: String = "q_id", cCol: String = "n_id", mCol: String = "m_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1], got $lambda")
    val wRel = Window.partitionBy(qCol).orderBy(col("rel").desc, col(cCol))
    var selected = short
      .withColumn("__rk", row_number().over(wRel)).filter(col("__rk") === 1)
      .select(col(qCol), col(cCol), col("rel"),
        round(lit(lambda) * col("rel"), 12).as("mmr"), lit(1).as("step"))
    for (i <- 2 to k) {
      // Left-join the penalty: a shortlist candidate with no sim row
      // against any selected item gets penalty 0 (its similarity is
      // unknown ≈ unrelated) instead of silently vanishing from every
      // later step when the caller's sims table is incomplete.
      val simToSel = sims
        .join(selected.select(col(qCol), col(cCol).as(mCol)), Seq(qCol, mCol))
        .groupBy(qCol, cCol)
        .agg(max(col("sim")).as("pen"))
      val pen = short
        .join(selected.select(qCol, cCol), Seq(qCol, cCol), "left_anti")
        .join(simToSel, Seq(qCol, cCol), "left")
        .select(col(qCol), col(cCol), col("rel"),
          coalesce(col("pen"), lit(0.0)).as("pen"))
      val wM = Window.partitionBy(qCol).orderBy(col("mmr").desc, col(cCol))
      val pick = pen
        .withColumn("mmr",
          round(lit(lambda) * col("rel") - lit(1 - lambda) * col("pen"), 12))
        .withColumn("__rk", row_number().over(wM)).filter(col("__rk") === 1)
        .select(col(qCol), col(cCol), col("rel"), col("mmr"), lit(i).as("step"))
      selected = Components.cut(selected.unionByName(pick), None)
    }
    selected.select(col(qCol), col("step"), col(cCol), col("rel"), col("mmr"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Common-neighbor link prediction over an undirected edge list.
  *
  * Adamic–Adar (Adamic & Adar 2003, "Friends and neighbors on the Web"):
  * for a non-adjacent pair (u, v), score Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) —
  * shared neighbors count as evidence, discounted by how promiscuous the
  * shared neighbor is.
  *
  * Plan shape: wedges come from joining the directed neighbor view to
  * itself ON THE CENTER z, so the cost is Σ_z deg(z)² — the same budget
  * [[Triangles]] spends and the standard distributed formulation; no
  * |V|² pair enumeration anywhere. Per-wedge weights are rounded at 15 dp
  * and summed as DECIMAL (partition-order free); existing edges are
  * removed with an anti join. For skew (a celebrity z with deg ≫ others)
  * the usual mitigations apply upstream: cap deg(z) or drop hub centers
  * before the wedge join — a z with deg(z) = d contributes d² wedges but
  * only 1/ln d score each, so hub caps lose almost no signal.
  */
object LinkPrediction {

  /** Scores for all non-adjacent pairs. `und` must carry undirected
    * edges with `uCol` < `vCol`, one row per edge (no duplicates). Output:
    * (u, v, common_neighbors, aa_score), u < v, unordered.
    */
  def adamicAdar(und: DataFrame, uCol: String = "u", vCol: String = "v"): DataFrame = {
    val u = col(uCol); val v = col(vCol)
    val nb = und.select(u.as("z"), v.as("nbr"))
      .unionByName(und.select(v.as("z"), u.as("nbr")))
    val deg = nb.groupBy("z").agg(count(lit(1)).as("deg"))
    val wedges = nb.select(col("z"), col("nbr").as("a"))
      .join(nb.select(col("z"), col("nbr").as("b")), "z")
      .filter(col("a") < col("b"))
    wedges.join(deg, "z")
      .groupBy(col("a").as(uCol), col("b").as(vCol))
      .agg(
        count(lit(1)).as("common_neighbors"),
        round(sum(round(lit(1.0) / log(col("deg").cast("double")), 15)
          .cast(DecimalType(38, 15))).cast("double"), 12).as("aa_score"))
      .join(und, Seq(uCol, vCol), "left_anti")
  }
}

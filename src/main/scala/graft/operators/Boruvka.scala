package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Borůvka's minimum-spanning-forest algorithm (1926) — the parallel MST:
  * every component selects its minimum incident cross edge, selected edges
  * join the forest, touched components contract, repeat. MST over a
  * similarity graph is the backbone of single-linkage clustering (cutting
  * the forest at a distance threshold yields exactly the single-link
  * dendrogram's flat clusters), which is why a curation engine wants it
  * next to the connected-components operator.
  *
  * Determinism & replay contract (unlike [[Components]], which may finish
  * on a driver union-find): BOTH the round count and the per-round
  * contraction depth are FIXED (`rounds`, `jumps`), and every selection is
  * totally ordered — min edge per component by (w, a, b) via one
  * degree-bounded window, contraction labels by min-label propagation
  * exactly `jumps` hops down the selected forest. Fixed depth means the
  * contraction may be PARTIAL in a round (a long selected chain keeps >1
  * label); that costs extra rounds, never correctness, and it is what
  * makes the recurrence an exact chained-CTE replay for the oracle — no
  * convergence loop an SQL engine can't express. A production run sizes
  * `rounds` ≈ log₂(components) + slack; the census output exposes
  * `n_components` per round so an undersized budget is visible, not
  * silent.
  *
  * Scale shape per round: one edges⋈labels join (co-partitioned on the
  * node key), one per-component window over candidate min edges (bounded
  * by component degree), `jumps` label joins over the FOREST edges
  * (≤ components rows, two orders smaller than the graph). Edge volume is
  * touched once per round; everything else is component-sized.
  */
object Boruvka {

  /** Per-round census of the growing forest over canonical weighted edges
    * `(a, b, w)` with a < b. Returns one row per round:
    * (round, n_selected, round_weight, n_components).
    */
  def forestCensus(edges: DataFrame, rounds: Int, jumps: Int): DataFrame = {
    val dec6 = DecimalType(38, 6)
    // one materialization of the edge list: every round's cross-edge join,
    // and nothing else, re-reads it (without the cut, each of the ~6
    // consumers per round would replay the caller's edge derivation)
    val e = Components.cut(edges.select("a", "b", "w"), None)
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    var comp = nodes.select(col("node"), col("node").as("comp"))
    val censuses = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val cross = e
        .join(comp.select(col("node").as("a"), col("comp").as("ca")), Seq("a"))
        .join(comp.select(col("node").as("b"), col("comp").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb"))
      val cand = cross.select(col("ca").as("c"), col("w"), col("a"), col("b"),
          col("ca"), col("cb"))
        .union(cross.select(col("cb").as("c"), col("w"), col("a"), col("b"),
          col("ca"), col("cb")))
      // materialized per round: the selection feeds the contraction's
      // `jumps` label joins AND the census aggregate — uncut, each consumer
      // replays the cross join + window
      val sel = Components.cut(cand
        .withColumn("rn", row_number().over(
          Window.partitionBy("c").orderBy(col("w"), col("a"), col("b"))))
        .filter(col("rn") === 1)
        .select("w", "a", "b", "ca", "cb")
        .distinct(), None)
      // contract along the selected forest: min-label propagation, exactly
      // `jumps` hops (partial contraction is allowed — see scaladoc)
      val cg = sel.select(col("ca").as("x"), col("cb").as("y"))
        .union(sel.select(col("cb").as("x"), col("ca").as("y")))
      var lab = comp.select(col("comp").as("c")).distinct()
        .select(col("c"), col("c").as("lab"))
      for (_ <- 1 to jumps) {
        // the Components.propagate shape: neighbor-min as its own
        // aggregate (fresh attributes), then a left join back — never a
        // direct self-join of the label frame
        val nbrMin = cg
          .join(lab.select(col("c").as("y"), col("lab").as("nlab")), "y")
          .groupBy(col("x").as("c"))
          .agg(min("nlab").as("mn"))
        lab = lab.join(nbrMin, Seq("c"), "left")
          .select(col("c"),
            least(col("lab"), coalesce(col("mn"), col("lab"))).as("lab"))
      }
      comp = Components.cut(
        comp.join(lab, col("comp") === col("c"))
          .select(col("node"), col("lab").as("comp")), None)
      val nComp = comp.agg(countDistinct(col("comp")).as("n_components"))
      censuses += sel.agg(
          count(lit(1)).as("n_selected"),
          coalesce(sum(col("w").cast(dec6)), lit(0).cast(dec6)).as("w_sum"))
        .crossJoin(broadcast(nComp))
        .select(lit(r).as("round"), col("n_selected"),
          round(col("w_sum").cast("double"), 6).as("round_weight"),
          col("n_components"))
    }
    censuses.reduce(_.union(_)).orderBy("round")
  }
}

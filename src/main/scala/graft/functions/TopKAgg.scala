package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}

/** Exact bounded top-k per group (SURVEY §2c): a window `row_number`
  * materializes and sorts every row of every group; this aggregate carries
  * at most k entries per group through the partial/final aggregation, so
  * shuffle volume is O(groups·k) instead of O(rows) — the difference
  * between sorting 100 TB and merging bounded buffers at scale.
  *
  * Implementation: [[graft.expressions.TopKExpr]], a native
  * `TypedImperativeAggregate` over a primitive bounded heap (the original
  * `Aggregator` form paid an encoder round trip per input row — ~100 s of
  * pure serialization on a 4M-pair knn build). Ordering is `score DESC,
  * id ASC` with NaN ranking first, exactly like both engines' `ORDER BY
  * score DESC` total order, so the window-sort equivalence holds verbatim
  * on NaN-bearing data.
  */
object TopKAgg {

  /** Column function: `topK(k)(scoreCol, idCol)` → array<struct<score,id>>
    * of the group's top k, highest first.
    */
  def topK(k: Int): (Column, Column) => Column =
    (score, id) => GraftColumnBridge.column(
      graft.expressions.TopKExpr(
        GraftColumnBridge.expression(score.cast("double")),
        GraftColumnBridge.expression(id.cast("long")),
        k).toAggregateExpression())
}

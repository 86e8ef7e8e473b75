package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with the same keys and `right.ts <= left.ts` — trade
  * attribution, slowly-changing-dimension lookup, "state as of" queries.
  *
  * Spark has no native ASOF JOIN; the naive rewrite (range join + window)
  * explodes to every ≤-pair before picking one. This implementation is the
  * sort-based union trick: interleave both sides on (keys, ts), carry the
  * right payload forward with `last(_, ignoreNulls)` over an unbounded
  * preceding window, keep left rows. Cost = one shuffle on keys + one
  * sort — linear in |L|+|R|, no pair blowup, AQE-compatible. Equal
  * timestamps match (right sorts before left at the same ts).
  */
object AsOfJoin {

  private val TsCol = "__graft_asof_ts"
  private val SideCol = "__graft_asof_side"
  private val PayloadCol = "__graft_asof_payload"

  /** Left rows plus `rightPayload` columns (renamed `prefix+name`) from the
    * latest right row at or before the left row's `leftTs`, null when no
    * such row. The payload travels as ONE struct so all emitted columns
    * come from the same right row (per-column carry would resurrect stale
    * values beneath a newer row's legitimate nulls). `right` is first
    * deduped to one row per (keys, ts) — highest payload first — so the
    * result is deterministic.
    */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val leftCols = left.columns.toSeq
    val outPayload = rightPayload.map(prefix + _)
    val reserved = Seq(TsCol, SideCol, PayloadCol)
    require(!(leftCols ++ rightPayload).exists(reserved.contains),
      s"column names $reserved are reserved by asOf")
    require(outPayload.intersect(leftCols).isEmpty,
      s"output columns ${outPayload.intersect(leftCols)} collide with left columns; " +
        "pass a different prefix")
    val leftTypes = leftCols.map(c => c -> left.schema(c).dataType).toMap

    val rDedup = Dedup.firstWriterWins(
      right, keys :+ rightTs, rightPayload.map(col(_).desc))
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = {
      val d = rDedup.select(payloadStruct.as(PayloadCol))
      d.schema(PayloadCol).dataType
    }

    val l = left.select(
      (keys.map(col) :+ col(leftTs).as(TsCol) :+ lit(1).as(SideCol)) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(payloadType).as(PayloadCol): _*)
    val r = rDedup.select(
      (keys.map(col) :+ col(rightTs).as(TsCol) :+ lit(0).as(SideCol)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(leftTypes(c)).as(c)) :+
        payloadStruct.as(PayloadCol): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightPayload.map(c => col(s"$PayloadCol.$c").as(s"$prefix$c")): _*)
  }
}

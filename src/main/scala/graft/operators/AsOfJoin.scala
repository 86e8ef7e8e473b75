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

  /** Left rows plus `rightPayload` columns (renamed `prefix+name`) from the
    * latest right row at or before the left row's `leftTs`, null when no
    * such row. `right` is first deduped to one row per (keys, ts) — the
    * highest-payload-first row wins — so the result is deterministic.
    */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadTypes = rightPayload.map(c => c -> right.schema(c).dataType).toMap
    val leftTypes = leftCols.map(c => c -> left.schema(c).dataType).toMap

    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightPayload.map(c => lit(null).cast(payloadTypes(c)).as(s"$prefix$c")): _*)
    val rDedup = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy((keys :+ rightTs).map(col): _*)
          .orderBy(rightPayload.map(c => col(c).desc): _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val r = rDedup.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        rightPayload.map(c => col(c).as(s"$prefix$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +: rightPayload.map(c =>
        last(col(s"$prefix$c"), ignoreNulls = true).over(w).as(s"_c_$prefix$c")): _*)
    carried
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          rightPayload.map(c => col(s"_c_$prefix$c").as(s"$prefix$c")): _*)
  }
}

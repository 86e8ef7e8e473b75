package graft.operators

import graft.functions.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer aggregates.
  *
  * Reference: `gold_monthly_spending(month, year, total_spend, avg_spend)` is
  * declared but never populated (/root/reference/src/sql/create_gold_layer.sql:1-6);
  * the implied query is a calendar-month rollup of the fact table. Hash
  * aggregate with automatic partial (map-side) combine — one shuffle on
  * (year, month), ~84 groups at any scale, so the reduce side is trivial
  * even at 100 TB; all heavy lifting happens map-side.
  */
object GoldAgg {

  /** Monthly spend rollup: (year, month, total_spend, avg_spend, n_rows).
    * Output year/month column names are parameterized so both the TPC-H
    * query surface (o_year/o_month) and the medallion gold mart share one
    * implementation.
    */
  def monthlySpend(
      fact: DataFrame, dateCol: String, amountCol: String,
      yearName: String = "o_year", monthName: String = "o_month"): DataFrame =
    fact
      .groupBy(
        year(col(dateCol)).as(yearName),
        month(col(dateCol)).as(monthName))
      .agg(
        Exact.sumD(col(amountCol)).as("total_spend"),
        Exact.avgD(col(amountCol)).as("avg_spend"),
        count(lit(1)).as("n_rows"))
      .orderBy(yearName, monthName)
}

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

  /** Incremental-maintenance form of [[monthlySpend]]: per-batch partial
    * state `(year, month, total_dec, n_rows)` with the total carried as
    * DECIMAL — decimal addition is associative, so folding batch states
    * with [[mergeMonthlyState]] and then [[finishMonthly]] equals the full
    * rebuild BIT-FOR-BIT, for any batch split. This is materialized-view
    * maintenance for the gold mart: each refresh aggregates only the new
    * fact rows (map-side partials, ~84 groups shuffled) and merges into
    * dozens of state rows, instead of re-scanning the whole history.
    */
  def monthlySpendState(
      fact: DataFrame, dateCol: String, amountCol: String,
      yearName: String = "o_year", monthName: String = "o_month"): DataFrame =
    fact
      .groupBy(
        year(col(dateCol)).as(yearName),
        month(col(dateCol)).as(monthName))
      .agg(
        sum(col(amountCol).cast(org.apache.spark.sql.types.DecimalType(30, 4)))
          .as("total_dec"),
        count(col(amountCol)).as("n_vals"), // avg denominator: non-null amounts
        count(lit(1)).as("n_rows"))

  /** Union-merge two monthly states (associative, exact). */
  def mergeMonthlyState(a: DataFrame, b: DataFrame,
      yearName: String = "o_year", monthName: String = "o_month"): DataFrame =
    a.unionByName(b)
      .groupBy(yearName, monthName)
      .agg(sum(col("total_dec")).as("total_dec"),
        sum(col("n_vals")).as("n_vals"), sum(col("n_rows")).as("n_rows"))

  /** Publish a monthly state with [[monthlySpend]]'s exact output schema
    * and arithmetic (decimal total cast to double; avg = that double over
    * the count — the same formula `Exact.avgD` evaluates).
    */
  def finishMonthly(state: DataFrame,
      yearName: String = "o_year", monthName: String = "o_month"): DataFrame =
    state.select(
      col(yearName), col(monthName),
      col("total_dec").cast("double").as("total_spend"),
      (col("total_dec").cast("double") / col("n_vals")).cast("double").as("avg_spend"),
      col("n_rows"))
      .orderBy(yearName, monthName)
}

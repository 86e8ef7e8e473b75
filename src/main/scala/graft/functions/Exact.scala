package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers for differential testing against a serial engine.
  *
  * Summing doubles is order-dependent; Spark's partial aggregation order is
  * nondeterministic across partitions, so `sum(double)` cannot hash-match a
  * serial oracle bit-for-bit. Routing the sum through an exact decimal makes
  * it associative (and therefore partition-order independent) while keeping
  * the public output type `double`. At 100 TB this costs one widening cast
  * per row inside the partial aggregate — still whole-stage codegen'd.
  */
object Exact {
  /** Order-independent sum of a double column, returned as double. */
  def sumD(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Order-independent mean of a double column, returned as double. */
  def avgD(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(30, scale))).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Order-independent sum via the native 128-bit fixed-point
    * accumulator ([[graft.expressions.FixedPointSumAgg]]) — same
    * associativity guarantee as [[sumD]] at a fraction of the per-row
    * cost (one multiply + floor + integer add vs a decimal allocation
    * and overflow-checked decimal add; measured ~0.4 s/sum/600k rows for
    * the decimal path). Use for moment-matrix aggregates that take many
    * sums per scan; the SQL twin is [[sumFxSql]]. Rounds the BINARY
    * double half-away-from-zero at `scale` digits — numerically
    * equivalent to, but not bit-for-bit the same contract as, the
    * decimal cast (which rounds the decimal string); queries must use
    * the matching twin on both sides.
    */
  def sumFx(c: Column, scale: Int = 6): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.FixedPointSumAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast(DoubleType)),
        scale).toAggregateExpression())

  /** DuckDB replay of [[sumFx]] over SQL expression `e`. NaN/Inf inputs
    * are filtered to NULL before the HUGEINT cast (DuckDB errors on
    * `CAST(NaN AS HUGEINT)` instead of skipping), matching the Spark
    * side's skip-non-finite contract; an empty/all-null group yields
    * NULL on both engines.
    */
  def sumFxSql(e: String, scale: Int = 6): String =
    s"(CAST(sum(CAST(CASE WHEN NOT isfinite($e) THEN NULL" +
      s" WHEN ($e) * 1e$scale >= 0 THEN floor(($e) * 1e$scale + 0.5)" +
      s" ELSE ceil(($e) * 1e$scale - 0.5) END AS HUGEINT)) AS DOUBLE) / 1e$scale)"
}

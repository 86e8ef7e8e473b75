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
}

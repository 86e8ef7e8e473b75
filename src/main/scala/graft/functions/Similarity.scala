package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector-similarity column functions over `array<float>` embeddings.
  *
  * All built from higher-order array functions (zip_with/aggregate) — no
  * UDFs, no driver-side math. Accumulation is decimal, not double, so the
  * result is independent of evaluation order and bit-identical to any
  * serial engine computing the same formula (same trick as [[Exact]]).
  */
object Similarity {

  private val Dec = DecimalType(38, 20)

  /** Exact dot product of two float-array columns, as double. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(java.math.BigDecimal.ZERO).cast(Dec),
      // re-cast: decimal addition widens (38,20)→(38,19) under Spark's
      // precision rules, but aggregate() requires a type-stable accumulator;
      // the cast is value-exact here (|sum| ≪ 10^18)
      (acc, v) => (acc + v).cast(Dec))
      .cast("double")

  /** Euclidean norm, as double. */
  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  /** Cosine similarity of two float-array columns, as double. */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))
}

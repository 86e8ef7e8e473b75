package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._

/** [[graft.expressions.FixedPointSumAgg]] — the 128-bit fixed-point exact
  * sum behind Exact.sumFx (q131's moment matrix, CovOuterSumAgg's cells).
  */
class FixedPointSumSpec extends SparkSpec {
  import spark.implicits._

  /** Serial reference of the documented contract: half-away-from-zero
    * rounding of x·10^s on the BINARY double, exact integer total,
    * correctly-rounded back to double, divided by 10^s.
    */
  private def reference(xs: Seq[Double], scale: Int): Double = {
    val pow = math.pow(10.0, scale)
    val total = xs.filter(x => !x.isNaN && !x.isInfinite)
      .map { x =>
        val y = x * pow
        val r = if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
        new java.math.BigDecimal(r).toBigInteger
      }
      .foldLeft(java.math.BigInteger.ZERO)(_.add(_))
    total.doubleValue() / pow
  }

  private def sumFx(xs: Seq[Double], scale: Int, parts: Int = 4): Double =
    xs.toDF("x").repartition(parts)
      .agg(Exact.sumFx(col("x"), scale).as("s"))
      .collect().head.getDouble(0)

  test("matches the serial reference on mixed-sign values") {
    val xs = Seq(1.25, -2.5, 0.1, 0.3, -0.0001235, 123.456789, -0.05, 7.0)
    for (scale <- Seq(0, 2, 6)) {
      assert(java.lang.Double.compare(sumFx(xs, scale), reference(xs, scale)) === 0,
        s"scale $scale")
    }
  }

  test("partition-count invariant (associative integer partials)") {
    val xs = (1 to 5000).map(i => math.sin(i.toDouble) * 1000.0)
    val expect = reference(xs, 6)
    for (parts <- Seq(1, 3, 17)) {
      assert(java.lang.Double.compare(sumFx(xs, 6, parts), expect) === 0, s"parts $parts")
    }
  }

  test("large quantized values take the exact slow path") {
    // |x·10^6| > 2^62 forces the BigInteger fallback; totals stay exact
    val xs = Seq(6.0e12, 6.0e12, -5.0e12, 1.0)
    assert(java.lang.Double.compare(sumFx(xs, 6), reference(xs, 6)) === 0)
    assert(sumFx(xs, 6) === 7.000000000001e12)
  }

  test("non-finite inputs are skipped like SQL nulls") {
    val xs = Seq(1.5, Double.NaN, Double.PositiveInfinity, 2.5)
    assert(sumFx(xs, 2) === 4.0)
  }

  test("empty and all-null/non-finite groups evaluate to NULL like SQL sum") {
    val empty = Seq.empty[Double].toDF("x")
      .agg(Exact.sumFx(col("x"), 6).as("s")).collect().head
    assert(empty.isNullAt(0))
    val allNonFinite = Seq(Double.NaN, Double.PositiveInfinity).toDF("x")
      .agg(Exact.sumFx(col("x"), 6).as("s")).collect().head
    assert(allNonFinite.isNullAt(0))
    // grouped: a group present in the data still sums; seen-flag survives
    // the shuffle serialization round trip
    val grouped = Seq((1, 1.5), (1, 2.5), (2, Double.NaN)).toDF("k", "x")
      .repartition(4)
      .groupBy("k").agg(Exact.sumFx(col("x"), 2).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(grouped(1) === Some(4.0))
    assert(grouped(2) === None)
  }

  test("a single value past 127 bits errors instead of wrapping") {
    val e = intercept[org.apache.spark.SparkException] {
      sumFx(Seq(1.0e300), 6)
    }
    assert(e.getMessage.contains("128-bit") ||
      Option(e.getCause).exists(_.getMessage.contains("128-bit")))
  }

  test("half-away-from-zero at the quantization boundary") {
    // 0.005 at scale 2 → 0.5 in binary is 0.005000000000000000104…·100
    // = 0.5000000000000000104 → floor(+0.5) keeps 1; -0.005 → -1
    assert(sumFx(Seq(0.005), 2) === 0.01)
    assert(sumFx(Seq(-0.005), 2) === -0.01)
  }

  test("carry propagation across the 64-bit boundary") {
    // many near-2^62 addends exercise lo-word overflow into hi
    val big = 4.0e18 // quantized at scale 0: 4e18 < 2^62
    val xs = Seq.fill(8)(big)
    assert(java.lang.Double.compare(sumFx(xs, 0, 2), reference(xs, 0)) === 0)
    assert(sumFx(xs, 0, 2) === 3.2e19)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, when, xxhash64}

/** Mergeable HyperLogLog distinct-count sketch as a typed `Aggregator`
  * (SURVEY §2c) — the sketch every 100 TB pipeline keeps PER PARTITION /
  * PER DAY and unions later, which `approx_count_distinct`'s one-shot
  * result cannot do. The buffer is the dense register array (2^p bytes);
  * `merge` is element-wise max, so the estimate is associative,
  * commutative, and identical for any partitioning of the input — a
  * differential-testable determinism guarantee most approx aggregates
  * lack.
  *
  * Input is a pre-hashed 64-bit value (apply [[HllAgg.hllDistinct]] which
  * feeds `xxhash64`); p index bits select a register, the leading-zero
  * rank of the remaining bits maxes into it. Estimation uses the classic
  * Flajolet–Fuss–Gandouet–Meunier raw estimate with linear counting below
  * 2.5·m (the regime that matters for per-group cardinalities) and the
  * 2^64 large-range correction.
  */
object HllAgg {

  final case class Buf(regs: Array[Byte])

  // input is boxed so a NULL (excluded value) can flow through the udaf
  // and be skipped in reduce — a primitive-Long encoder would throw on it
  class HllAggregator(p: Int) extends Aggregator[java.lang.Long, Buf, Long] {
    require(p >= 4 && p <= 16, s"precision must be in [4,16], got $p")
    private val m = 1 << p

    private def alpha: Double = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }

    override def zero: Buf = Buf(new Array[Byte](m))

    override def reduce(b: Buf, boxedHash: java.lang.Long): Buf = {
      if (boxedHash == null) return b // NULL input value: not counted
      val hash = boxedHash.longValue()
      val idx = (hash >>> (64 - p)).toInt
      // rank = leading zeros of the remaining 64-p bits, +1; cap 64-p+1
      val rest = hash << p
      val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > b.regs(idx)) b.regs(idx) = rank.toByte
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < m) {
        if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
        i += 1
      }
      a
    }

    override def finish(b: Buf): Long = {
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += 1.0 / (1L << b.regs(i))
        if (b.regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else if (raw > 6.148914691236517e17) // 2^64/30: large-range correction
          -1.8446744073709552e19 * math.log1p(-raw / 1.8446744073709552e19)
        else raw
      math.round(est)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: approximate distinct count of `c` at precision `p`
    * (standard error ≈ 1.04/√(2^p)). NULLs are excluded, matching
    * `count(DISTINCT c)` / `approx_count_distinct` semantics — without the
    * guard, `xxhash64(NULL)` passes the bare seed hash through and NULL
    * would count as one extra distinct value.
    */
  def hllDistinct(c: Column, p: Int = 12): Column =
    udaf(new HllAggregator(p), Encoders.LONG)(
      when(c.isNotNull, xxhash64(c)))
}

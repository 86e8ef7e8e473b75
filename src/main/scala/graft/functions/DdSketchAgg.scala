package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable relative-error quantile sketch (DDSketch-style log bucketing,
  * SURVEY §2c) — the quantile counterpart to [[HllAgg]]: per-partition /
  * per-day sketches union by bucket-count addition, so the result is
  * associative, commutative, and partition-order INVARIANT (t-digest, the
  * usual alternative, is none of these — its centroids depend on merge
  * order). Any quantile q is answered within relative error α: values
  * collapse into buckets ⌈log_γ x⌉ with γ = (1+α)/(1−α), and the bucket
  * midpoint 2γᵏ/(γ+1) is at most α away from every value in the bucket.
  *
  * Positive values bucket logarithmically; zeros and negatives (absent in
  * telemetry-style inputs, but handled) collapse into a single
  * below-range bucket estimated as 0. The buffer is a sparse bucket→count
  * map; a `TypedImperativeAggregate` with a dense array is the binary-
  * buffer perf upgrade if this ever sits on a per-row hot path.
  */
object DdSketchAgg {

  final case class Buf(counts: Map[Int, Long])

  private val ZeroBucket = Int.MinValue

  class DdSketchAggregator(qs: Seq[Double], alpha: Double)
      extends Aggregator[Double, Buf, Seq[Double]] {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad quantiles $qs")
    private val gamma = (1 + alpha) / (1 - alpha)
    private val lnGamma = math.log(gamma)

    private def bucket(x: Double): Int =
      if (x <= 0 || x.isNaN) ZeroBucket
      else math.ceil(math.log(x) / lnGamma).toInt

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, x: Double): Buf = {
      val k = bucket(x)
      Buf(b.counts.updated(k, b.counts.getOrElse(k, 0L) + 1L))
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf(b.counts.foldLeft(a.counts) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      })

    override def finish(b: Buf): Seq[Double] = {
      val n = b.counts.valuesIterator.sum
      if (n == 0) return qs.map(_ => Double.NaN)
      val sorted = b.counts.toArray.sortBy(_._1)
      qs.map { q =>
        val target = math.max(0L, math.ceil(q * n).toLong - 1L) // 0-based rank
        var cum = 0L
        var i = 0
        var est = Double.NaN
        while (i < sorted.length && est.isNaN) {
          cum += sorted(i)._2
          if (cum > target) {
            val k = sorted(i)._1
            est = if (k == ZeroBucket) 0.0 else 2.0 * math.pow(gamma, k) / (gamma + 1)
          }
          i += 1
        }
        est
      }
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: `qs` quantiles of `c` as array<double>, relative error
    * ≤ `alpha`.
    */
  def quantiles(c: Column, qs: Seq[Double], alpha: Double = 0.01): Column =
    udaf(new DdSketchAggregator(qs, alpha), Encoders.scalaDouble)(c.cast("double"))
}

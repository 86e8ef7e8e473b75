package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable heavy-hitters sketch (Misra–Gries / Frequent, SURVEY §2c) —
  * the third sketch family next to [[HllAgg]] (distinct counts) and
  * [[DdSketchAgg]] (quantiles): bounded-memory approximate top items,
  * the way a 100 TB pipeline finds dominant tokens / domains / n-grams
  * without shuffling a full (item, count) table.
  *
  * The summary holds at most k−1 counters. Guarantees over n processed
  * items (preserved by the merge, Agarwal et al., "Mergeable Summaries",
  * PODS'12):
  *   - UNDERCOUNT ONLY: est(x) ≤ f(x);
  *   - bounded error: f(x) − est(x) ≤ n/k, so every x with f(x) > n/k
  *     is present in the summary (no heavy hitter is missed).
  * Both bounds are pure integer arithmetic — `(exact − est)·k ≤ n` — so
  * an oracle engine can replay them exactly over a landed candidate set
  * (the q66/q67 pattern).
  *
  * Merge = counter addition, then, if over k−1 counters, subtract the
  * k-th largest counter value from all and drop the non-positive — the
  * standard offset step that keeps the union's error additive.
  */
object FreqSketchAgg {

  final case class Buf(items: Map[String, Long])

  class MisraGriesAggregator(k: Int)
      extends Aggregator[String, Buf, Map[String, Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, x: String): Buf = {
      if (x == null) return b // nulls are not counted, like count(col)
      val m = b.items
      m.get(x) match {
        case Some(c) => Buf(m.updated(x, c + 1))
        case None if m.size < k - 1 => Buf(m.updated(x, 1L))
        case None =>
          // decrement all; drop zeros (amortized O(1) per item with a
          // mutable impl — the Map form keeps the Aggregator encoder simple
          // and this sketch off the per-row hot path is k-bounded anyway)
          Buf(m.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None })
      }
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val sum = b.items.foldLeft(a.items) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k - 1) Buf(sum)
      else {
        // subtract the k-th largest value from every counter, keep > 0:
        // at most k-1 survive and every estimate stays an undercount
        val kth = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k - 1)
        Buf(sum.flatMap { case (w, c) => if (c > kth) Some(w -> (c - kth)) else None })
      }
    }

    override def finish(b: Buf): Map[String, Long] = b.items

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: map<item, est_count> of ≤ k−1 heavy-hitter candidates. */
  def heavyHitters(c: Column, k: Int): Column =
    udaf(new MisraGriesAggregator(k), Encoders.STRING)(c)
}

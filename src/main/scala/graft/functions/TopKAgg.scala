package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact bounded top-k as a typed `Aggregator` (SURVEY §2c): per-group
  * top-k without a full window sort. A window `row_number` materializes and
  * sorts every row of every group; this aggregator carries at most k
  * entries per group through the partial/final aggregation, so shuffle
  * volume is O(groups·k) instead of O(rows) — the difference between
  * sorting 100 TB and merging bounded buffers at scale.
  *
  * Ordering: score descending, id ascending on ties (deterministic —
  * matches `ORDER BY score DESC, id` in the oracle). NaN ranks FIRST,
  * exactly like both Spark's and DuckDB's `ORDER BY score DESC` (their
  * total order puts NaN above +Infinity), so the window-sort equivalence
  * holds verbatim on NaN-bearing data.
  */
object TopKAgg {

  final case class Scored(score: Double, id: Long)
  final case class Buf(items: Seq[Scored])

  // total order: NaN class first (engine DESC semantics), then score
  // descending, then id ascending. Treating NaN as a separate class keeps
  // the comparator transitive (raw IEEE compares involving NaN are not —
  // undefined top-k membership and a TimSort contract crash otherwise)
  // while `==` on the non-NaN branch keeps -0.0 == 0.0, matching both
  // engines' SQL orderings.
  private def lt(a: Scored, b: Scored): Boolean = {
    val na = a.score.isNaN
    val nb = b.score.isNaN
    if (na != nb) na // NaN ranks first under DESC
    else if (na) a.id < b.id // among NaNs, scores tie — id decides
    else a.score > b.score || (a.score == b.score && a.id < b.id)
  }

  class TopKAggregator(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    override def zero: Buf = Buf(Vector.empty)

    // buffer invariant: sorted by `lt`, length <= k
    private def insertSorted(items: Seq[Scored], in: Scored): Seq[Scored] = {
      val (before, after) = items.span(lt(_, in))
      (before :+ in) ++ after
    }

    override def reduce(b: Buf, in: Scored): Buf =
      if (b.items.length < k) Buf(insertSorted(b.items, in))
      else if (lt(in, b.items.last)) Buf(insertSorted(b.items, in).take(k))
      else b // O(1) reject below the current k-th — the per-row hot path

    override def merge(a: Buf, b: Buf): Buf =
      Buf((a.items ++ b.items).sortWith(lt).take(k))

    override def finish(b: Buf): Seq[Scored] = b.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: `topK(k)(scoreCol, idCol)` → array<struct<score,id>>
    * of the group's top k, highest first.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (score, id) => fn(score, id)
  }
}

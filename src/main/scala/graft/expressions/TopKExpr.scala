package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native `TypedImperativeAggregate` over a
  * primitive binary heap — the hot-path replacement for the original
  * `Aggregator`-based [[graft.functions.TopKAgg]] buffer.
  *
  * Why not an `Aggregator`/`udaf`: ScalaAggregator round-trips the buffer
  * through an `ExpressionEncoder` on EVERY input row (decode Seq[Scored] →
  * insert → re-encode), which made a 4M-pair brute-force knn spend ~100 s
  * in encoder work alone. This form keeps the buffer as two primitive
  * arrays (`double[]`, `long[]`) for the whole partial aggregation; rows
  * below the current k-th are rejected with two array reads and no
  * allocation. Serialization to bytes happens once per partial buffer at
  * shuffle time (`serialize`), not per row — the same contract
  * ObjectHashAggregate gives HLL/DDSketch-style sketches.
  *
  * Ordering contract (identical to the original, and to `ORDER BY score
  * DESC, id`): NaN ranks first (both engines' DESC total order puts NaN
  * above +Inf), then score descending, then id ascending — a transitive
  * total order, so heap membership is deterministic. Null score or id
  * inputs are skipped (aggregate-input semantics, like `max`).
  *
  * Output: `array<struct<score double, id bigint>>`, best first, length ≤ k.
  */
case class TopKExpr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKExpr.Heap] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "graft_top_k"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKExpr.ResultType

  override def createAggregationBuffer(): TopKExpr.Heap = new TopKExpr.Heap(k)

  override def update(buf: TopKExpr.Heap, input: InternalRow): TopKExpr.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKExpr.Heap, b: TopKExpr.Heap): TopKExpr.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKExpr.Heap): Any = {
    val (s, ids) = buf.sortedBestFirst()
    val rows = new Array[Any](s.length)
    var i = 0
    while (i < s.length) {
      rows(i) = InternalRow(s(i), ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKExpr.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKExpr.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKExpr.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKExpr =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKExpr {

  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** `a` ranks strictly before `b`: NaN class first (engine DESC
    * semantics), then score descending, then id ascending. `==` on the
    * non-NaN branch keeps -0.0 == 0.0, matching SQL orderings; the
    * explicit NaN class keeps the comparator transitive where raw IEEE
    * compares are not.
    */
  private def lt(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val na = java.lang.Double.isNaN(sa)
    val nb = java.lang.Double.isNaN(sb)
    if (na != nb) na
    else if (na) ia < ib
    else sa > sb || (sa == sb && ia < ib)
  }

  /** Bounded binary heap of (score, id), root = WORST element under [[lt]]
    * (the eviction candidate), so a full heap admits a new element with one
    * root compare and O(log k) sift. Arrays are parallel primitives — no
    * boxing anywhere on the per-row path.
    */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    // `i` loses to `j`: i should sit ABOVE j in the worst-first heap
    private def worse(si: Double, ii: Long, sj: Double, ij: Long): Boolean =
      lt(sj, ij, si, ii)

    def offer(s: Double, id: Long): Unit =
      if (size < k) {
        var c = size
        scores(c) = s; ids(c) = id
        size += 1
        while (c > 0) { // sift up while worse than parent
          val p = (c - 1) >> 1
          if (worse(scores(c), ids(c), scores(p), ids(p))) {
            swap(c, p); c = p
          } else return
        }
      } else if (lt(s, id, scores(0), ids(0))) { // better than current worst
        scores(0) = s; ids(0) = id
        siftDown()
      }

    private def siftDown(): Unit = {
      var c = 0
      while (true) {
        val l = 2 * c + 1
        val r = l + 1
        var w = c // worst of (c, children) bubbles to the top
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) return
        swap(c, w)
        c = w
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** Contents ordered best-first (the output contract). */
    def sortedBestFirst(): (Array[Double], Array[Long]) = {
      val idx = Array.range(0, size).sortWith { (i, j) =>
        lt(scores(i), ids(i), scores(j), ids(j))
      }
      (idx.map(scores), idx.map(ids))
    }
  }
}

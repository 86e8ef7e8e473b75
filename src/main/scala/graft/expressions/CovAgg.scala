package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass upper-triangle outer-product sums for [[graft.operators.Pca]]'s
  * covariance — a native `TypedImperativeAggregate` replacing a
  * posexplode-of-d²-products pipeline whose nested `transform` lambdas ran
  * interpreted (CodegenFallback) per element: ~10M boxed lambda
  * evaluations per corpus scan dominated the q138 bench time.
  *
  * Per input row this reads the vector once and, for every i ≤ j,
  * quantizes `vᵢ·vⱼ` at 15 digits with PURE double arithmetic —
  * `y = prod·10¹⁵`, then `floor(y + 0.5)` / `ceil(y − 0.5)` (half away
  * from zero) — and adds the integral result into a per-cell signed
  * 128-bit register (the [[FixedPointSumAgg]] scheme; the first cut of
  * this aggregate accumulated `BigDecimal.setScale(15, HALF_UP)` per
  * product, whose allocation+add cost was most of the remaining q138
  * bench time). Integer addition is associative, so partial buffers
  * merge partition-order-free, and a serial engine replays each cell
  * bit-for-bit as
  * `CAST(sum(CAST(<half-away-rounded prod·1e15> AS HUGEINT)) AS DOUBLE)
  * / 1e15` — 128-bit→double conversion is correctly rounded on both
  * engines.
  *
  * Cells carry their own contribution counts, so ragged vectors degrade
  * exactly like the old per-cell `count(1)`: a row contributes to cell
  * (i,j) iff its dimension exceeds max(i,j). The triangle is indexed
  * j·(j+1)/2 + i — independent of d, so a longer row just extends the
  * arrays without remapping. Non-finite products are skipped like SQL
  * nulls; |prod| must stay below ~4.6e3 for the single-long fast path
  * (normalized-embedding regime), with an exact BigInteger fallback
  * above it.
  *
  * Output: array<struct<i int, j int, s double, n bigint>>, upper
  * triangle only (the caller mirrors — products are commutative).
  */
case class CovOuterSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovOuterSumAgg.Buf] with ImplicitCastInputTypes {

  override def prettyName: String = "graft_cov_outer_sum"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = false
  override def dataType: DataType = CovOuterSumAgg.ResultType

  override def createAggregationBuffer(): CovOuterSumAgg.Buf =
    new CovOuterSumAgg.Buf

  override def update(buf: CovOuterSumAgg.Buf, input: InternalRow): CovOuterSumAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: CovOuterSumAgg.Buf, b: CovOuterSumAgg.Buf): CovOuterSumAgg.Buf = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: CovOuterSumAgg.Buf): Any = {
    val out = new Array[Any](buf.cells)
    var idx = 0
    var j = 0
    while (j < buf.d) {
      var i = 0
      while (i <= j) {
        out(idx) = InternalRow(i, j, buf.cellDouble(idx), buf.counts(idx))
        i += 1
        idx += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovOuterSumAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.cells)
    bb.putInt(buf.d)
    var i = 0
    while (i < buf.cells) {
      bb.putLong(buf.counts(i))
      bb.putLong(buf.hi(i))
      bb.putLong(buf.lo(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovOuterSumAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CovOuterSumAgg.Buf
    buf.resizeTo(bb.getInt)
    var i = 0
    while (i < buf.cells) {
      buf.counts(i) = bb.getLong
      buf.hi(i) = bb.getLong
      buf.lo(i) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovOuterSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovOuterSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovOuterSumAgg =
    copy(child = newChildren(0))
}

object CovOuterSumAgg {

  val ResultType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  private val Pow15 = 1e15
  private val FastMax = 4.611686018427388e18 // 2^62: single-long quantized bound

  final class Buf {
    var d: Int = 0
    var hi: Array[Long] = Array.empty
    var lo: Array[Long] = Array.empty
    var counts: Array[Long] = Array.empty
    def cells: Int = d * (d + 1) / 2

    /** Extends the triangle to dimension `nd`; existing cell indices are
      * layout-stable (j·(j+1)/2 + i does not involve d).
      */
    def resizeTo(nd: Int): Unit = if (nd > d) {
      val nCells = nd * (nd + 1) / 2
      val nh = new Array[Long](nCells)
      val nl = new Array[Long](nCells)
      val nc = new Array[Long](nCells)
      System.arraycopy(hi, 0, nh, 0, cells)
      System.arraycopy(lo, 0, nl, 0, cells)
      System.arraycopy(counts, 0, nc, 0, cells)
      d = nd; hi = nh; lo = nl; counts = nc
    }

    private def add128(idx: Int, bh: Long, bl: Long): Unit = {
      val newLo = lo(idx) + bl
      val carry = ((lo(idx) & bl) | ((lo(idx) | bl) & ~newLo)) >>> 63
      hi(idx) = hi(idx) + bh + carry
      lo(idx) = newLo
    }

    def add(arr: ArrayData): Unit = {
      val n = arr.numElements()
      if (n > d) resizeTo(n)
      val v = new Array[Double](n)
      var i = 0
      while (i < n) { v(i) = arr.getDouble(i); i += 1 }
      var j = 0
      while (j < n) {
        val base = j * (j + 1) / 2
        val vj = v(j)
        var k = 0
        while (k <= j) {
          val y = v(k) * vj * Pow15
          if (!java.lang.Double.isNaN(y) && !java.lang.Double.isInfinite(y)) {
            val idx = base + k
            val r = if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
            if (r >= -FastMax && r <= FastMax) {
              val rl = r.toLong
              add128(idx, rl >> 63, rl)
            } else {
              val big = new java.math.BigDecimal(r).toBigInteger
              add128(idx, big.shiftRight(64).longValue(), big.longValue())
            }
            counts(idx) += 1L
          }
          k += 1
        }
        j += 1
      }
    }

    def mergeFrom(o: Buf): Unit = {
      if (o.d > d) resizeTo(o.d)
      var i = 0
      while (i < o.cells) {
        add128(i, o.hi(i), o.lo(i))
        counts(i) += o.counts(i)
        i += 1
      }
    }

    /** Cell value as double: exact 128-bit total, correctly-rounded to
      * double, divided by 10¹⁵ — the SQL twin's sequence.
      */
    def cellDouble(idx: Int): Double = {
      val big = java.math.BigInteger.valueOf(hi(idx)).shiftLeft(64)
        .add(new java.math.BigInteger(1, {
          val b = new Array[Byte](8)
          ByteBuffer.wrap(b).putLong(lo(idx))
          b
        }))
      big.doubleValue() / Pow15
    }
  }
}

package graft.expressions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
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
  * Per input row this reads the vector once and accumulates, for every
  * i ≤ j, `BigDecimal.valueOf(vᵢ·vⱼ).setScale(15, HALF_UP)` into the
  * (i,j) cell — the exact value the old pipeline's `round(prod, 15)
  * CAST DECIMAL(38,15)` produced (Spark's Round is the same
  * valueOf/setScale sequence, and for the |prod| ≲ 4 regime the oracle
  * validates, the double→decimal re-cast of the rounded double recovers
  * the same 15-dp decimal). BigDecimal addition is exact and
  * order-independent, so partial buffers merge partition-order-free —
  * the same contract the DECIMAL(38,15) SQL sum gave.
  *
  * Cells carry their own contribution counts, so ragged vectors degrade
  * exactly like the old per-cell `count(1)`: a row contributes to cell
  * (i,j) iff its dimension exceeds max(i,j). The triangle is indexed
  * j·(j+1)/2 + i — independent of d, so a longer row just extends the
  * arrays without remapping.
  *
  * Output: array<struct<i int, j int, s decimal(38,15), n bigint>>, upper
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
        val dec = Decimal(buf.sums(idx))
        dec.changePrecision(38, 15)
        out(idx) = InternalRow(i, j, dec, buf.counts(idx))
        i += 1
        idx += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovOuterSumAgg.Buf): Array[Byte] = {
    val parts = (0 until buf.cells).map(i => buf.sums(i).unscaledValue.toByteArray)
    val bb = ByteBuffer.allocate(
      4 + parts.map(p => 12 + p.length).sum)
    bb.putInt(buf.d)
    var i = 0
    while (i < buf.cells) {
      bb.putLong(buf.counts(i))
      bb.putInt(parts(i).length)
      bb.put(parts(i))
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
      val p = new Array[Byte](bb.getInt)
      bb.get(p)
      buf.sums(i) = new JBigDecimal(new BigInteger(p), 15)
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
      StructField("s", DecimalType(38, 15), nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  private val Zero15 = JBigDecimal.ZERO.setScale(15)

  final class Buf {
    var d: Int = 0
    var sums: Array[JBigDecimal] = Array.empty
    var counts: Array[Long] = Array.empty
    def cells: Int = d * (d + 1) / 2

    /** Extends the triangle to dimension `nd`; existing cell indices are
      * layout-stable (j·(j+1)/2 + i does not involve d).
      */
    def resizeTo(nd: Int): Unit = if (nd > d) {
      val nCells = nd * (nd + 1) / 2
      val ns = Array.fill[JBigDecimal](nCells)(Zero15)
      val nc = new Array[Long](nCells)
      System.arraycopy(sums, 0, ns, 0, cells)
      System.arraycopy(counts, 0, nc, 0, cells)
      d = nd; sums = ns; counts = nc
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
          val idx = base + k
          sums(idx) = sums(idx).add(
            JBigDecimal.valueOf(v(k) * vj).setScale(15, RoundingMode.HALF_UP))
          counts(idx) += 1L
          k += 1
        }
        j += 1
      }
    }

    def mergeFrom(o: Buf): Unit = {
      if (o.d > d) resizeTo(o.d)
      var i = 0
      while (i < o.cells) {
        sums(i) = sums(i).add(o.sums(i))
        counts(i) += o.counts(i)
        i += 1
      }
    }
  }
}

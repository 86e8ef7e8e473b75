package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index d of cell (x, y) on the 2^bits × 2^bits grid —
  * the classic per-bit-plane descent (quadrant bits rx/ry, gray-coded cell
  * offset, reflect+swap rotation into canonical orientation).
  *
  * A native expression because the loop must STAY a loop: composing it from
  * when/bitwise built-ins nests each plane's x/y CASE twice inside the next
  * plane (the swap step reads both), so the expression tree is exponential
  * in `bits` — it analyzes fine at a spec's 5 bits and OOMs Catalyst
  * analysis at the production 12. Here eval and the generated Java both run
  * the O(bits) loop over primitives inside whole-stage codegen.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && 2 * bits <= 62, s"hilbert needs 1 <= bits <= 31, got $bits")

  override def prettyName: String = "graft_hilbert"
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val n = 1L << bits
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: the expression can appear twice in one codegen stage
      val x = ctx.freshName("ghX")
      val y = ctx.freshName("ghY")
      val d = ctx.freshName("ghD")
      val s = ctx.freshName("ghS")
      val rx = ctx.freshName("ghRx")
      val ry = ctx.freshName("ghRy")
      val t = ctx.freshName("ghT")
      val n = 1L << bits
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(new HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))
}

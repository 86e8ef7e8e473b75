package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * The built-in route (`aggregate(zip_with(...))`) is a `CodegenFallback`
  * higher-order function: it interprets a lambda expression tree per array
  * element, boxing every intermediate. On a 64-dim float vector that is
  * ~100× slower than a fused loop. These expressions generate a tight
  * primitive loop inside whole-stage codegen instead, which is what makes
  * the O(candidate) similarity verification affordable at scale.
  */
abstract class FloatVecBinary extends BinaryExpression with ImplicitCastInputTypes {
  // declares array<float> inputs at analysis time: SQL callers passing
  // array<double> get an implicit element cast instead of getFloat reading
  // garbage over 8-byte slots (covariant override — AbstractDataType itself
  // is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** IEEE-double dot product of two float arrays: Σ a(i)·b(i), accumulated
  * left-to-right in double. Each float product is exact in double; only the
  * running sum rounds, so the result is within n·ε of the true value —
  * ideal as a pre-filter with a guard band (see [[DotDecimal]] for the
  * oracle-exact form).
  */
case class DotDouble(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "graft_dot_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local names: the same expression can appear several times in
      // one whole-stage-codegen function, where fixed names would collide
      val n = ctx.freshName("gdN")
      val acc = ctx.freshName("gdAcc")
      val i = ctx.freshName("gdI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Decimal-exact dot product, value-identical to
  * `CAST(sum(CAST(a(i)*b(i) AS DECIMAL(38,20))) AS DOUBLE)` (Spark) and
  * `CAST(list_sum(list_transform(... DECIMAL(38,20)))) AS DOUBLE)` (DuckDB):
  * each exact double product is rounded HALF_UP to 20 decimal places, the
  * scale-20 sum is exact and order-independent, and only the final
  * `doubleValue()` rounds. This keeps engine results hash-comparable to a
  * serial oracle regardless of partitioning.
  */
case class DotDecimal(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "graft_dot_decimal"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      acc = acc.add(new java.math.BigDecimal(p)
        .setScale(20, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("gxN")
      val acc = ctx.freshName("gxAcc")
      val i = ctx.freshName("gxI")
      val p = ctx.freshName("gxP")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  $acc = $acc.add(new java.math.BigDecimal($p)
         |    .setScale(20, java.math.RoundingMode.HALF_UP));
         |}
         |${ev.value} = $acc.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def dotDouble(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotDouble(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dotDecimal(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotDecimal(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

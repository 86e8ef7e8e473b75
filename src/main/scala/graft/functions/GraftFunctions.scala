package graft.functions

import graft.expressions.{DotDecimal, DotDouble, HilbertIndex, TextSketchExprs, WinnowExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions, so `spark.sql` users
  * get the same codegen'd hot paths as the Scala API:
  *
  * {{{
  *   GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT graft_dot_double(a.embedding, b.embedding) ...")
  * }}}
  *
  * (The same builders can be injected at session build time through
  * `SparkSessionExtensions.injectFunction` for deployments that configure
  * `spark.sql.extensions`.)
  */
object GraftFunctions {

  /** (identifier, info, checked builder) for every graft SQL function —
    * consumed by both runtime registration ([[registerAll]]) and build-time
    * injection ([[graft.GraftSparkExtensions]]).
    */
  lazy val functionSet: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Int, Seq[Expression] => Expression)](
      ("graft_dot_double", 2, args => DotDouble(args(0), args(1))),
      ("graft_dot_decimal", 2, args => DotDecimal(args(0), args(1))),
      ("graft_word_shingles", 2,
        args => TextSketchExprs.WordShingles(args(0), intLit(args(1)))),
      ("graft_minhash_sig", 2,
        args => TextSketchExprs.MinHashSig(args(0), intLit(args(1)))),
      ("graft_simhash64", 1, args => TextSketchExprs.SimHash64(args(0))),
      ("graft_winnow_fingerprints", 3,
        args => WinnowExpr.WinnowFingerprints(args(0), intLit(args(1)), intLit(args(2)))),
      ("graft_hilbert", 3,
        args => HilbertIndex(args(0), args(1), intLit(args(2))))
    ).map { case (name, arity, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity arguments")
          builder(args)
        })
    }

  def registerAll(spark: SparkSession): Unit =
    functionSet.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Constant-int parameter: any foldable integral expression qualifies
    * (builders run before constant folding, so `1+2` or `CAST(64 AS INT)`
    * arrive unfolded).
    */
  private def intLit(e: Expression): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"parameter must be a constant integer, got non-constant ${e.sql}")
    val v = e.dataType match {
      case IntegerType | ShortType | ByteType | LongType => e.eval()
      case dt => throw new IllegalArgumentException(
        s"parameter must be a constant integer, got ${dt.simpleString}: ${e.sql}")
    }
    v match {
      case null => throw new IllegalArgumentException("parameter must not be null")
      case i: java.lang.Integer => i.intValue()
      case s: java.lang.Short => s.intValue()
      case b: java.lang.Byte => b.intValue()
      case l: java.lang.Long =>
        require(l >= Int.MinValue && l <= Int.MaxValue, s"parameter out of int range: $l")
        l.intValue()
    }
  }
}

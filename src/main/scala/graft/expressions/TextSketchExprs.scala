package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-sketching hot path.
  *
  * The higher-order-function route (`transform`/`aggregate`/`array_min`)
  * evaluates an interpreted expression tree per array element — measured at
  * ~2.7 ms/document for 3-gram shingling alone, which dominates the whole
  * near-dup pipeline. These expressions do the same work as one primitive
  * loop over `ArrayData` per row, ~100× less per-element overhead.
  * All three implement `doGenCode` as a static-kernel call — the same
  * method interpreted eval uses, so the two paths cannot drift — keeping
  * the expression inside whole-stage codegen: a CodegenFallback anywhere
  * in a projection drops the ENTIRE projection (every coresident
  * expression) back to interpreted eval, not just the one node.
  *
  * Hashing uses the same xxhash64 (seed 42) as `functions.xxhash64`, via
  * Spark's own XXH64.
  */
object TextSketchExprs {

  private val SEED = 42L

  /** Mersenne prime 2³¹−1; MinHash perms run mod P so a·h+b stays ≪ 2⁶³. */
  val P = 2147483647L

  private def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, SEED)

  /** Distinct word n-grams (space-joined) of a token array, first-occurrence
    * order. Empty array when fewer than n tokens.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    override def prettyName: String = "graft_word_shingles"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      TextSketchExprs.shinglesKernel(input.asInstanceOf[ArrayData], n)

    // kernel-call codegen: a CodegenFallback here wouldn't just interpret
    // THIS expression — it drops the whole projection (including the
    // MinHash/SimHash built on the shingles) out of whole-stage codegen
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks =>
        s"${ev.value} = graft.expressions.TextSketchExprs.shinglesKernel($toks, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val space = UTF8String.fromString(" ")

  /** Shared eval/codegen kernel for [[WordShingles]]. */
  def shinglesKernel(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }

  /** MinHash signature over a shingle array: h₀ = xxhash64(s) mod P, then
    * numPerms Carter-Wegman perms hᵢ = (aᵢ·h₀ + bᵢ) mod P, min-folded in one
    * pass. Null for an empty array (no signature exists).
    */
  case class MinHashSig(child: Expression, numPerms: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(numPerms >= 1, s"numPerms must be >= 1, got $numPerms")
    override def prettyName: String = "graft_minhash_sig"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true

    // same constants as the prior HOF formulation (Sketches.splitmix64 streams)
    private val as: Array[Long] = Array.tabulate(numPerms)(i =>
      java.lang.Math.floorMod(graft.functions.Sketches.splitmix64(2L * i), P - 1) + 1)
    private val bs: Array[Long] = Array.tabulate(numPerms)(i =>
      java.lang.Math.floorMod(graft.functions.Sketches.splitmix64(2L * i + 1), P))

    override def nullSafeEval(input: Any): Any = {
      val shingles = input.asInstanceOf[ArrayData]
      if (shingles.numElements() == 0) return null
      TextSketchExprs.minHashKernel(shingles, as, bs)
    }

    // kernel-call codegen (see Ann.CentroidArgmax for the pattern): one
    // static call per row inside the codegen'd stage instead of the
    // CodegenFallback row-boxing path. The empty-array → NULL contract is
    // preserved by flipping isNull inside the non-null branch.
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, shingles => {
        val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
        val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
        s"""
           |if ($shingles.numElements() == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} =
           |    graft.expressions.TextSketchExprs.minHashKernel($shingles, $asRef, $bsRef);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[MinHashSig]] (non-empty input). */
  def minHashKernel(shingles: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val m = shingles.numElements()
    val numPerms = as.length
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h0 = java.lang.Math.floorMod(xxh64(shingles.getUTF8String(i)), P)
      var k = 0
      while (k < numPerms) {
        val v = (as(k) * h0 + bs(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over a token array: per-token xxhash64, ±1 vote per bit,
    * MSB-first sign fold (bit 0 of the hash ends up the MSB — same layout as
    * the prior HOF formulation).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_simhash64"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      TextSketchExprs.simHashKernel(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks =>
        s"${ev.value} = graft.expressions.TextSketchExprs.simHashKernel($toks);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[SimHash64]]. */
  def simHashKernel(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val h = xxh64(toks.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      acc = (acc << 1) | (if (votes(b) > 0) 1L else 0L)
      b += 1
    }
    acc
  }

  def wordShingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(tokens), n))

  def minhashSig(shingles: Column, numPerms: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), numPerms))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}

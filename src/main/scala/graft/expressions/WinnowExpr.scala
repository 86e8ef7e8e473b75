package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
  * MOSS algorithm): hash every character k-gram with a rolling polynomial
  * hash, slide a window of w hashes, keep each window's minimum (rightmost
  * on ties). Guarantees: any shared substring of length ≥ k+w−1 yields at
  * least one shared fingerprint, and fingerprint density is ~2/(w+1)
  * regardless of document size — the sublinear-sketch property that makes
  * containment/partial-overlap detection affordable where whole-document
  * hashes (exact dedup) and bag-of-shingles Jaccard both miss it.
  */
object WinnowExpr {

  /** Distinct winnowing fingerprints of a (pre-normalized) string, in
    * first-selection order, as array<long>. Empty for texts shorter than k.
    */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    override def prettyName: String = "graft_winnow_fingerprints"
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      WinnowExpr.winnowKernel(input.asInstanceOf[UTF8String], k, w)

    // kernel-call codegen (see Ann.CentroidArgmax for the pattern): keeps
    // the quality/fingerprint projections this rides in fully codegen'd
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.expressions.WinnowExpr.winnowKernel($s, $k, $w);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val B = 257L

  /** Shared eval/codegen kernel for [[WinnowFingerprints]]. */
  def winnowKernel(input: UTF8String, k: Int, w: Int): ArrayData = {
    // B^(k-1) for removing the outgoing character (mod 2^64 wraparound —
    // any fixed total order works for window minima; splitmix64-finalized
    // values are what we emit). k is tiny, so recomputing per row is noise
    // next to the per-character loop below.
    var bk1 = 1L
    var p = 0
    while (p < k - 1) { bk1 *= B; p += 1 }
    val bytes = input.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = graft.functions.Sketches.splitmix64(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xFF) * bk1) * B + (bytes(i + k - 1) & 0xFF)
      hashes(i) = graft.functions.Sketches.splitmix64(h)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= w) {
      // single short window: rightmost minimum
      var best = 0
      var j = 1
      while (j < m) { if (hashes(j) <= hashes(best)) best = j; j += 1 }
      out.add(hashes(best))
    } else {
      var start = 0
      while (start + w <= m) {
        var best = start
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= hashes(best)) best = j; j += 1 }
        out.add(hashes(best))
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    new GenericArrayData(arr)
  }

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))
}

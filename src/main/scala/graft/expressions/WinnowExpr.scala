package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    override def prettyName: String = "graft_winnow_fingerprints"
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private val B = 257L

    // B^(k-1) for removing the outgoing character (mod 2^64 wraparound —
    // any fixed total order works for window minima; splitmix64-finalized
    // values are what we emit)
    private val Bk1: Long = {
      var p = 1L
      var i = 0
      while (i < k - 1) { p *= B; i += 1 }
      p
    }

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
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
        h = (h - (bytes(i - 1) & 0xFF) * Bk1) * B + (bytes(i + k - 1) & 0xFF)
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

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))
}

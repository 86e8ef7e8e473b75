package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) as a native codegen'd
  * expression — Spark ships `levenshtein` but not Jaro–Winkler, the
  * measure record-linkage practice actually standardized on (it rewards
  * shared prefixes, which is how real-world name variants differ).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` so the
  * oracle can grade the scores value-for-value (probed empirically on the
  * boundary cases, not assumed):
  *   - either side empty → 0.0 (including both empty);
  *   - match window = max(len)/2 − 1 (so 2-char swaps like ab/ba score 0);
  *   - transpositions = HALF THE MISMATCHED MATCH POSITIONS WITH INTEGER
  *     DIVISION (an odd mismatch count floors — 'abcvwxyz'/'cabvwxyz'
  *     scores 0.9583, not the 0.9375 a fractional ½-count would give);
  *   - Winkler boost `jw = j + l·0.1·(1−j)` only when jaro > 0.7, prefix
  *     l capped at 4.
  * The kernel is shared by interpreted eval and codegen (the
  * TextSketchExprs contract), so the paths cannot drift; comparisons on
  * UTF-16 code units (identical to DuckDB on ASCII catalogs — the only
  * place the engine applies it).
  */
object StringSimExprs {

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_jaro_winkler"
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any =
      StringSimExprs.jaroWinklerKernel(
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.StringSimExprs.jaroWinklerKernel($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Shared eval/codegen kernel. */
  def jaroWinklerKernel(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val sl = s.length
    val tl = t.length
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(0, math.max(sl, tl) / 2 - 1)
    val sMatched = new Array[Boolean](sl)
    val tMatched = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true
          tMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched positions between the two matched-character sequences,
    // halved with INTEGER division (DuckDB semantics)
    var mism = 0
    var si = 0
    var tj = 0
    while (si < sl) {
      if (sMatched(si)) {
        while (!tMatched(tj)) tj += 1
        if (s.charAt(si) != t.charAt(tj)) mism += 1
        tj += 1
      }
      si += 1
    }
    val trans = (mism / 2).toDouble
    val md = m.toDouble
    val jaro = (md / sl + md / tl + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(sl, tl))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

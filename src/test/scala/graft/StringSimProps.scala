package graft

import graft.expressions.StringSimExprs.jaroWinklerKernel
import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
import org.scalacheck.{Gen, Prop, Properties}

/** Pins the Jaro–Winkler ASCII-catalog contract by property instead of by
  * comment (StringSimExprs scaladoc): the engine's kernel compares UTF-16
  * code units, which equals codepoint semantics EXACTLY when both inputs
  * are BMP-only — in particular on the ASCII catalogs q264/q243 apply it
  * to, where it also equals DuckDB's value. Outside the precondition the
  * two semantics genuinely split, and the divergence witness below keeps
  * that fact executable: if someone "fixes" the kernel to codepoints (or
  * widens the call sites past ASCII) this spec fails and forces the
  * oracle-agreement question to be re-probed rather than silently drift.
  */
object StringSimProps extends Properties("StringSim") {

  /** Reference implementation of the SAME pinned semantics (window =
    * max(len)/2 − 1, integer-halved transpositions, 0.7 boost threshold,
    * prefix cap 4) but over Unicode CODEPOINTS — the other plausible
    * reading of "character".
    */
  private def jwCodepoints(sStr: String, tStr: String): Double = {
    val s = sStr.codePoints().toArray
    val t = tStr.codePoints().toArray
    val sl = s.length
    val tl = t.length
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(0, math.max(sl, tl) / 2 - 1)
    val sM = new Array[Boolean](sl)
    val tM = new Array[Boolean](tl)
    var m = 0
    for (i <- 0 until sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s(i) == t(j)) { sM(i) = true; tM(j) = true; m += 1; found = true }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var mism = 0
    var tj = 0
    for (si <- 0 until sl if sM(si)) {
      while (!tM(tj)) tj += 1
      if (s(si) != t(tj)) mism += 1
      tj += 1
    }
    val trans = (mism / 2).toDouble
    val md = m.toDouble
    val jaro = (md / sl + md / tl + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(sl, tl))
    while (l < maxL && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private val asciiStr: Gen[String] =
    Gen.listOf(Gen.choose(0x20.toChar, 0x7e.toChar)).map(_.mkString)

  // BMP + supplementary-plane mix (surrogate pairs in the UTF-16 form)
  private val unicodeStr: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.choose(0x20.toChar, 0x7e.toChar).map(_.toString),
    Gen.oneOf("é", "ß", "中", "あ").map(identity[String]),
    Gen.oneOf(0x1f600, 0x1f680, 0x10400).map(cp => new String(Character.toChars(cp)))
  )).map(_.mkString)

  property("ASCII precondition ⇒ unit semantics == codepoint semantics") =
    Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      jaroWinklerKernel(u(a), u(b)) == jwCodepoints(a, b)
    }

  property("kernel total on arbitrary Unicode: symmetric jaro base, in [0,1]") =
    Prop.forAll(unicodeStr, unicodeStr) { (a, b) =>
      val x = jaroWinklerKernel(u(a), u(b))
      val y = jaroWinklerKernel(u(b), u(a))
      // full JW is symmetric too (window, matches, transpositions, and the
      // common prefix are all symmetric under argument swap)
      x == y && x >= 0.0 && x <= 1.0
    }

  property("BMP-only inputs stay on codepoint semantics (surrogates are the only split)") =
    Prop.forAll(unicodeStr, unicodeStr) { (a, b) =>
      val bmpOnly = !(a + b).exists(Character.isSurrogate)
      !bmpOnly || jaroWinklerKernel(u(a), u(b)) == jwCodepoints(a, b)
    }

  property("divergence witness: supplementary plane splits the two semantics") = {
    // "😀a" vs "a😀x": as codepoints the match window is 0 and nothing
    // aligns (0.0); as UTF-16 units the surrogate pair stretches both
    // lengths, the window opens to 1, and the pair H,L matches (0.7222…).
    // The kernel is the UNIT reading — outside its documented ASCII
    // precondition it does NOT track codepoint (or DuckDB byte) semantics.
    val s = "😀a"
    val t = "a😀x"
    val unitVal = jaroWinklerKernel(u(s), u(t))
    val cpVal = jwCodepoints(s, t)
    Prop(cpVal == 0.0) && Prop(math.abs(unitVal - 0.7222222222222222) < 1e-12) &&
      Prop(unitVal != cpVal)
  }
}

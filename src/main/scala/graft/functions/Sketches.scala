package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketching primitives for near-duplicate detection: word shingles,
  * MinHash signatures, LSH band keys, SimHash. All deterministic (seeded
  * splitmix64 constants, xxhash64 base hashing) and UDF-free.
  *
  * MinHash/LSH design (standard banding scheme, cf. Broder '97 / MMDS ch.3):
  * a signature of `numPerms` min-wise hashes is split into `bands` bands of
  * `rowsPerBand`; docs sharing any band bucket become candidate pairs. Each
  * affine perm h_i(x) = a_i·x + b_i (a_i odd ⇒ bijective on Z/2^64) is
  * applied to one shared xxhash64 of the shingle, so the per-row cost is one
  * string hash plus k long multiply-adds.
  */
object Sketches {

  /** Deterministic pseudo-random 64-bit constants (splitmix64). */
  private[graft] def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Distinct word n-gram shingles of a text column (native eval loop —
    * the HOF formulation was the pipeline bottleneck, see
    * [[graft.expressions.TextSketchExprs]]).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.expressions.TextSketchExprs.wordShingles(TextFunctions.tokens(text), n)

  /** MinHash signature (`numPerms` longs in [0,P), P = 2³¹−1) over a shingle
    * array: h_i(x) = (a_i·xxhash64(x) + b_i) mod P with a_i ∈ [1,P), a
    * classic universal family (Carter-Wegman). Null for empty input.
    */
  def minhashSignature(shingles: Column, numPerms: Int): Column =
    graft.expressions.TextSketchExprs.minhashSig(shingles, numPerms)

  /** LSH band keys: one murmur3 hash per band over its signature slice.
    * Band index is encoded into the key so different bands never collide.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      hash(b, slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand))))

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components.
    */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")

  /** Exact Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(array_union(a, b)).cast("double"))
  }

  /** 64-bit SimHash over a token array: per-bit vote of xxhash64(token),
    * MSB-first sign fold. Near-dup docs differ in few bits (use
    * [[simhashBlocks]] + bit_count(xor) ≤ k to pair them).
    */
  def simhash(tokens: Column): Column =
    graft.expressions.TextSketchExprs.simhash64(tokens)

  /** The four 16-bit blocks of a SimHash — pairs within Hamming distance 3
    * must agree on at least one block (pigeonhole), so grouping by block is
    * a complete blocking scheme for distance ≤ 3.
    */
  def simhashBlocks(sh: Column): Column =
    array((0 until 4).map(b =>
      struct(
        lit(b).as("block_idx"),
        shiftrightunsigned(sh, 16 * b).bitwiseAND(lit(0xFFFFL)).as("block_val"))): _*)
}

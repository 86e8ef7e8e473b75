package graft.functions

import graft.expressions.VectorExprs
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity column functions over `array<float>` embeddings,
  * backed by the native codegen expressions in
  * [[graft.expressions.VectorExprs]] (a fused primitive loop instead of the
  * interpreted `aggregate(zip_with(...))` higher-order route — ~100× on the
  * pairwise hot path).
  *
  * Two accumulation modes:
  *  - `dotExact`/`cosine`: decimal accumulation (order-independent, bit-
  *    identical to a serial oracle computing the same formula) — use for
  *    anything hash-compared or rank-compared against DuckDB.
  *  - `dotFast`/`cosineFast`: IEEE-double accumulation — within n·ε of
  *    exact; use as a pre-filter with a guard band, never as final output.
  */
object Similarity {

  /** Exact (decimal-accumulated) dot product of two float-array columns. */
  def dotExact(a: Column, b: Column): Column = VectorExprs.dotDecimal(a, b)

  /** Fast IEEE-double dot product (order-dependent, prefilter only). */
  def dotFast(a: Column, b: Column): Column = VectorExprs.dotDouble(a, b)

  /** Euclidean norm (exact accumulation), as double. */
  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  /** Cosine similarity of two float-array columns, as double. */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))

  /** Cosine from a precomputed dot and per-vector norms (saves recomputing
    * norms per pair — precompute them once per vector before a pair join).
    */
  def cosineFromParts(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)
}

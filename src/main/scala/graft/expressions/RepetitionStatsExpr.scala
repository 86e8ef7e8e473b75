package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics over a token array — the primitives
  * behind Gopher-style repetitive-document filters (duplicate-word
  * fraction, most-common-bigram fraction, duplicate-character fraction).
  *
  * A per-row scalar (one static-kernel call per row inside whole-stage
  * codegen, primitive loops and open hash maps inside), so the filter is
  * embarrassingly parallel: no
  * shuffle at any scale, the whole quality pass runs at scan speed. The
  * equivalent relational formulation (explode → two hash aggregates + a
  * window for bigrams) pays two full shuffles of the exploded corpus —
  * ~60× the row count — for the same answer.
  *
  * Definitions (mirrored exactly by the q53 DuckDB oracle):
  *   total_words    — token count (split semantics: empty text ⇒ one
  *                    zero-length token, same as DuckDB string_split)
  *   distinct_words — distinct token count
  *   top_bigram     — occurrences of the most frequent adjacent pair
  *   dup_chars      — Σ over tokens seen c>1 times of (c−1)·len(token):
  *                    characters in occurrences beyond the first
  *   total_chars    — Σ len(token) over all occurrences
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "graft_repetition_stats"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("total_words", IntegerType, nullable = false),
    StructField("distinct_words", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.statsKernel(input.asInstanceOf[ArrayData])

  // kernel-call codegen (see Ann.CentroidArgmax for the pattern)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.expressions.RepetitionStats.statsKernel($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  def repetitionStats(tokens: Column): Column =
    GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(tokens)))

  private val space = UTF8String.fromString(" ")

  /** Shared eval/codegen kernel for [[RepetitionStats]]. */
  def statsKernel(toks: ArrayData): InternalRow = {
    val m = toks.numElements()
    val wordCounts = new java.util.HashMap[UTF8String, Array[Long]](m * 2)
    val bigramCounts = new java.util.HashMap[UTF8String, Array[Long]](m * 2)
    var totalChars = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < m) {
      val w = toks.getUTF8String(i)
      val chars = w.numChars().toLong
      totalChars += chars
      val slot = wordCounts.computeIfAbsent(w, _ => Array(0L, chars))
      slot(0) += 1L
      if (prev != null) {
        val bg = UTF8String.concatWs(space, prev, w)
        bigramCounts.computeIfAbsent(bg, _ => Array(0L))(0) += 1L
      }
      prev = w
      i += 1
    }
    var dupChars = 0L
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) {
      val s = wit.next()
      if (s(0) > 1L) dupChars += (s(0) - 1L) * s(1)
    }
    var topBigram = 0L
    val bit = bigramCounts.values().iterator()
    while (bit.hasNext) {
      val c = bit.next()(0)
      if (c > topBigram) topBigram = c
    }
    val row = new GenericInternalRow(5)
    row.setInt(0, m)
    row.setInt(1, wordCounts.size())
    row.setInt(2, topBigram.toInt)
    row.setLong(3, dupChars)
    row.setLong(4, totalChars)
    row
  }
}

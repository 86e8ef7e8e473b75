package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics at sketch-defined integer ranks — the
  * shared comparator machinery that makes the sketch queries (q29, q67)
  * oracle-gradable: both engines select the SAME untouched parquet double
  * by the SAME integer rank, so error-bound booleans computed from them
  * are bit-identical cross-engine (no interpolation, no rounding, no
  * engine-specific quantile definition).
  *
  * Every method has a SQL twin (`targetSelectSql` / `bracketSelectSql`)
  * emitting the identical arithmetic for the DuckDB oracle, with double
  * literals printed via `Double.toString` (shortest round-trip form, so
  * DuckDB parses back the exact same IEEE value Spark computes with).
  *
  * Scale note: these run a value-sorted window per group — fine for
  * VERIFICATION (the whole point is recomputing the exact answer the
  * sketch approximates), never the scale path itself.
  */
object OrderStats {

  /** `df` ranked by `valueCol` (cast double) within `part`: columns
    * (part, value, r = 0-based rank, n = group size). NULL values are
    * excluded BEFORE ranking — the sketches being graded skip nulls, and
    * the engines disagree on where nulls sort (Spark's default window
    * orderBy ranks them first, DuckDB's ORDER BY last), so a null row
    * would shift every rank on one side only. The SQL twins' `v` CTE must
    * carry the matching `WHERE value IS NOT NULL`.
    */
  private def ranked(df: DataFrame, part: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(part), col(valueCol).cast("double").as("value"))
      .withColumn("r",
        row_number().over(Window.partitionBy(part).orderBy("value")) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(part)))

  /** DDSketch's rank target for quantile q over n rows, 0-based:
    * max(0, ⌈q·n⌉ − 1) — mirrors `DdSketchAggregator.finish`.
    */
  private def targetRank(q: Double, n: Column): Column =
    greatest(lit(0L), ceil(lit(q) * n) - 1)

  /** Values at the DDSketch target ranks: one row per group with columns
    * `ex_1 .. ex_k` (1-based, matching `qs` order).
    */
  def rankTargets(df: DataFrame, part: String, valueCol: String,
      qs: Seq[Double]): DataFrame =
    ranked(df, part, valueCol)
      .groupBy(part)
      .agg(
        max(when(col("r") === targetRank(qs.head, col("n")), col("value")))
          .as("ex_1"),
        qs.tail.zipWithIndex.map { case (q, i) =>
          max(when(col("r") === targetRank(q, col("n")), col("value")))
            .as(s"ex_${i + 2}")
        }: _*)

  /** Double literal for DuckDB: bare `0.95` parses as DECIMAL and
    * multiplies EXACTLY, diverging from Spark's IEEE multiply when q·n
    * lands near an integer (the ADVICE q86 ulp trap) — CAST forces the
    * same double arithmetic Spark uses.
    */
  private def dbl(x: Double): String = s"CAST($x AS DOUBLE)"

  /** SQL twin of [[rankTargets]]'s aggregate list, over a CTE exposing
    * (event_type, value, r, n) — see q67's oracle.
    */
  def targetSelectSql(qs: Seq[Double]): String =
    qs.zipWithIndex.map { case (q, i) =>
      s"""max(CASE WHEN r = greatest(0, CAST(ceil(${dbl(q)} * n) AS BIGINT) - 1)
         |THEN value END) AS ex_${i + 1}""".stripMargin.replace("\n", " ")
    }.mkString(",\n                         ")

  /** Rank-error allowance for percentile_approx(accuracy): the GK summary
    * guarantees the returned element's rank within ~n/accuracy of target;
    * ⌈4n/accuracy⌉+2 absorbs the build/query epsilon split and the
    * q·(n−1)-vs-⌈q·n⌉ rank-definition off-by-ones while staying tight
    * (±3 ranks at n=2000, accuracy=10000).
    */
  private def allowance(n: Column, accuracy: Int): Column =
    ceil(n * lit(4.0 / accuracy)) + 2

  private def allowanceSql(accuracy: Int): String =
    s"CAST(ceil(n * ${dbl(4.0 / accuracy)}) AS BIGINT) + 2"

  /** Order-statistic brackets around each quantile's target rank
    * q·(n−1), widened by [[allowance]]: one row per group with columns
    * `lo_i`/`hi_i` (1-based, matching `qs` order). A percentile_approx
    * result within its rank guarantee lies in [lo_i, hi_i].
    */
  def rankBrackets(df: DataFrame, part: String, valueCol: String,
      qs: Seq[Double], accuracy: Int): DataFrame = {
    val d = allowance(col("n"), accuracy)
    val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
      val t = lit(q) * (col("n") - 1)
      Seq(
        max(when(col("r") === greatest(lit(0L), floor(t) - d), col("value")))
          .as(s"lo_${i + 1}"),
        max(when(col("r") === least(col("n") - 1, ceil(t) + d), col("value")))
          .as(s"hi_${i + 1}"))
    }
    ranked(df, part, valueCol).groupBy(part).agg(aggs.head, aggs.tail: _*)
  }

  /** SQL twin of [[rankBrackets]]'s aggregate list — see q29's oracle. */
  def bracketSelectSql(qs: Seq[Double], accuracy: Int): String = {
    val d = allowanceSql(accuracy)
    qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        s"""max(CASE WHEN r = greatest(0, CAST(floor(${dbl(q)} * (n - 1)) AS BIGINT) - ($d))
           |THEN value END) AS lo_${i + 1}""".stripMargin.replace("\n", " "),
        s"""max(CASE WHEN r = least(n - 1, CAST(ceil(${dbl(q)} * (n - 1)) AS BIGINT) + $d)
           |THEN value END) AS hi_${i + 1}""".stripMargin.replace("\n", " "))
    }.mkString(",\n                         ")
  }
}

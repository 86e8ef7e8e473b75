package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators (driver north star §2b): the sampling /
  * filtering stages between raw corpus and training mix.
  *
  *  - [[stratifiedSample]]: deterministic per-stratum downsampling — the
  *    data-mixing primitive ("keep 5% of web, 100% of reference text").
  *    Hash-gated rather than random: reproducible across retries, stable
  *    under repartitioning, and joinable (the same row is kept in every
  *    derived dataset). One codegen'd filter, no shuffle at all.
  *  - [[decontaminate]]: drop corpus documents sharing ≥ `minShared`
  *    word n-grams with a benchmark/blocklist corpus — the standard
  *    eval-contamination guard. Same inverted-index shape as
  *    [[NearDup.ngramJaccardPairs]]: the blocklist side collapses to
  *    DISTINCT shingle hashes (8 bytes each), the join is shuffle-on-hash,
  *    and nothing is ever O(|corpus| · |blocklist|).
  */
object Curation {

  /** Uniform-ish [0,1) from a key column via xxhash64 — the production
    * sampling gate (well-mixed bits; salt gives independent draws for
    * independent sampling decisions).
    */
  def uniformFromHash(key: Column, salt: Long = 0L): Column =
    pmod(xxhash64(key, lit(salt)), lit(1000000L)).cast("double") / lit(1000000.0)

  /** Keep each row iff `u` < its stratum's rate; strata absent from `rates`
    * are dropped (rate 0). `u` defaults to [[uniformFromHash]] of
    * `keyCol` — pass an explicit expression when the gate must be
    * reproducible in another engine (see q50's integer-arithmetic gate).
    */
  def stratifiedSample(
      df: DataFrame, strataCol: String, rates: Map[String, Double],
      u: Column): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(u < rateCol)
  }

  def stratifiedSample(
      df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double]): DataFrame =
    stratifiedSample(df, strataCol, rates, uniformFromHash(col(keyCol)))

  /** Corpus rows whose text shares ≥ `minShared` distinct word `n`-grams
    * with ANY blocklist document are removed. Counting is against the
    * blocklist's shingle UNION (one hit per distinct shingle), so a phrase
    * appearing in many benchmark docs still counts once — the conservative
    * contamination definition.
    */
  def decontaminate(
      corpus: DataFrame, blocklist: DataFrame, n: Int, minShared: Int): DataFrame = {
    val corpusShingles = corpus
      .select(col("doc_id"), explode(Sketches.wordShingles(col("text"), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val blocked = blocklist
      .select(explode(Sketches.wordShingles(col("text"), n)).as("s"))
      .select(xxhash64(col("s")).as("s"))
      .distinct()
    val contaminated = corpusShingles.join(blocked, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("doc_id")
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }
}

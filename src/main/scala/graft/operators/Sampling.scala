package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling and rank-binning primitives that avoid the two naive
  * shapes that die at 100 TB: a global ORDER BY ... LIMIT n (single-task
  * sort of the corpus) and an unpartitioned ranking window.
  *
  * [[sampleExactN]] draws EXACTLY n rows, deterministically, as "the n
  * smallest values of a seeded id scramble" — a fixed-size uniform-ish
  * sample whose membership is reproducible in any engine (unlike
  * `df.sample`, which is fraction-based, partitioning-dependent, and
  * non-replayable). The selection rides [[graft.functions.TopKAgg]]: each
  * partition's partial carries at most n candidates, so the exchange is
  * O(partitions·n) instead of a corpus sort. (For n large enough that
  * partitions·n itself hurts, the standard escalation is a two-level
  * tree-merge of the same bounded buffers — same operator, one more
  * stage.)
  *
  * [[rankBins]] assigns each row its global rank-based bin (decile,
  * percentile, ...) under a total order — the "quality bucketing" step of
  * curriculum/filter pipelines — via [[Packing.prefixSumBy]]'s two-phase
  * scan: range-repartition, per-partition counts to the driver, broadcast
  * base offsets. No single-partition stage anywhere.
  */
object Sampling {

  /** Exactly `min(n, |df|)` rows of `df`, chosen as the n smallest seeded
    * scrambles of `idCol` (non-negative, unique). Deterministic for a
    * given (corpus, seed) and replayable as
    * `ORDER BY scramble(id), id LIMIT n`.
    */
  def sampleExactN(df: DataFrame, idCol: String, n: Int, seed: Long): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val topkFn = graft.functions.TopKAgg.topK(n)
    // TopKAgg keeps the HIGHEST scores: negate the scramble so "n smallest
    // scrambles" is the kept set; scrambles are < 2^30, exact in a double
    val picked = df
      .select(col(idCol), (-Sharding.scramble(col(idCol), seed).cast("double")).as("__neg"))
      .agg(topkFn(col("__neg"), col(idCol)).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id").as(idCol))
    // n rows — always the broadcast side
    df.join(broadcast(picked), idCol)
  }

  /** Adds `bin` ∈ [0, nBins): the row's global rank-based bin under
    * ascending (orderCols...) — bin = rank·nBins div total, so bins differ
    * in size by at most 1 (the ntile split without ntile's unpartitioned
    * window). The order-key tuple must be duplicate-free (append a unique
    * tiebreaker, exactly like [[Packing.prefixSumBy]] requires).
    */
  def rankBins(df: DataFrame, orderCols: Seq[String], nBins: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val ranked = Packing.prefixSumBy(
      df.withColumn("__one", lit(1L)), orderCols, "__one", "__rank",
      checkpointDir = checkpointDir)
    // count the INPUT (rankBins is row-preserving): a plain scan, not a
    // replay of the rank pipeline's offset join + window
    val total = df.agg(count(lit(1)).as("__total"))
    ranked
      .crossJoin(broadcast(total)) // single-row broadcast, not a driver collect
      .withColumn("bin", expr(s"CAST((__rank * ${nBins}L) div __total AS INT)"))
      .drop("__one", "__rank", "__total")
  }

  /** Quantile normalization across strata: adds `calibrated` = the GLOBAL
    * score value at the same quantile the row occupies WITHIN its stratum
    * — the cross-source score-calibration step that makes per-source
    * quality scores comparable before a global threshold (heterogeneous
    * scorers / source-specific score distributions are the norm in
    * web-scale curation).
    *
    * target global rank = r_s·(n−1) div max(m−1, 1), with r_s the row's
    * 0-based within-stratum rank, m its stratum size, n the corpus size.
    *
    * Scale shape: within-stratum ranks do NOT use a stratum-partitioned
    * window (one task per stratum = one task per SOURCE — fatal when a
    * source is a third of the corpus). Instead: one global two-phase
    * prefix scan over (stratum, score, id) gives a global rank from which
    * each stratum's broadcast base offset is subtracted; a second scan
    * over (score, id) gives the global value-by-rank table, equi-joined
    * on the target rank. Every stage is parallel; driver state is bounded
    * by partition count + stratum count. (Rank arithmetic multiplies
    * r_s·(n−1) in a Long — exact while the corpus is < ~3·10⁹ rows; past
    * that, route the product through DECIMAL(38,0).)
    *
    * (score, id) tuples must be duplicate-free per [[Packing.prefixSumBy]];
    * `idCol` is the usual unique tiebreaker.
    */
  def quantileNormalize(df: DataFrame, strataCol: String, scoreCol: String,
      idCol: String, checkpointDir: Option[String] = None): DataFrame = {
    val keyed = df.withColumn("__one", lit(1L))
    val bySrc = Packing.prefixSumBy(
      keyed, Seq(strataCol, scoreCol, idCol), "__one", "__gr",
      checkpointDir = checkpointDir)
    val strata = bySrc.groupBy(strataCol)
      .agg(min(col("__gr")).as("__base"), count(lit(1)).as("__m"))
    // corpus size from the (tiny) strata aggregate — not a third full scan
    val total = strata.agg(sum(col("__m")).as("__n"))
    val globalRanked = Packing.prefixSumBy(
      keyed, Seq(scoreCol, idCol), "__one", "__rg",
      checkpointDir = checkpointDir)
      .select(col("__rg").as("__target"), col(scoreCol).as("calibrated"))
    bySrc
      .join(broadcast(strata), strataCol)
      .crossJoin(broadcast(total)) // single row
      .withColumn("__target",
        expr("((__gr - __base) * (__n - 1)) div greatest(__m - 1, 1L)"))
      .join(globalRanked, "__target")
      .drop("__one", "__gr", "__base", "__m", "__n", "__target")
  }
}

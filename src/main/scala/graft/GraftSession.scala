package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory for the engine's entry points (Verify, Bench,
  * ScaleUp, PlanAudit, TuneLsh) — one place that owns the shuffle-sizing
  * policy so every main gets the same, zero-hand-tuning behavior.
  *
  * Shuffle sizing is RUNTIME-DERIVED, not a fixed knob: the ×100
  * self-scale probe measured a 3.7–7× spill tail on the five fact-join
  * queries at `shuffle.partitions = cores` (PLANS.md, round 9) that
  * vanished at 256 partitions — but 256 is exactly the kind of
  * per-deployment hand knob a 100 TB engine must not require. Instead:
  *
  *  - `adaptive.coalescePartitions.initialPartitionNum = 512`: every
  *    shuffle STARTS wide enough that a ×100 fact join's reduce side fits
  *    in executor memory without spill (512 × ~64 MB advisory ≈ 32 GB of
  *    shuffle data per stage before any spill pressure).
  *  - AQE partition coalescing (`parallelismFirst` default) then merges
  *    the tiny post-shuffle partitions of SMALL stages back down to
  *    ~`defaultParallelism`, so sf0.1-scale queries pay no extra task
  *    overhead — the runtime picks the partition count per stage from the
  *    OBSERVED shuffle bytes, which is the size-derived behavior the
  *    deployment knob was approximating by hand.
  *  - AQE skew-join splitting stays on (default) as the runtime
  *    complement to the explicit salting operator ([[operators.SkewJoin]],
  *    q34): oversized partitions of a sort-merge join are split at
  *    runtime even when the writer didn't anticipate the skew.
  *
  * `spark.sql.shuffle.partitions` stays at the core count as the
  * AQE-disabled fallback floor (tests pin their own tiny value).
  */
object GraftSession {

  /** Pre-coalesce width of every shuffle; AQE shrinks small stages back
    * down, so this bounds spill without taxing small queries.
    */
  val InitialShufflePartitions = 512

  def build(appName: String, defaultCpus: String = "4"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        InitialShufflePartitions.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

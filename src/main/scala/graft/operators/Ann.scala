package graft.operators

import graft.functions.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the classic
  * cluster-then-probe scale path: partition the corpus into `nlist` Voronoi
  * cells (mini k-means over cosine), search only the `nprobe` cells nearest
  * each query. Versus [[NearDup.knnBruteForce]]'s O(|Q|·|C|) scoring, IVF
  * scores ~|Q|·|C|·nprobe/nlist — the standard recall/throughput dial.
  *
  * Spark shape: centroids are tiny (nlist × dim floats) and live in
  * broadcast literals; assignment is a codegen'd argmax of [[Similarity]]
  * dot products (no shuffle); the probe is an equi-join on cell id (one
  * shuffle, AQE-skew-safe); top-k is a per-query window. Training is
  * Lloyd iterations with per-dimension distributed means (posexplode →
  * groupBy(cell, dim)), so no vector ever aggregates on the driver beyond
  * the nlist centroids themselves — at 100 TB the corpus pass count is
  * `iters + 1`, all linear scans.
  *
  * Deterministic: seeds are the `nlist` lowest vec_ids; means are exact
  * decimal sums; ties in argmax break toward the lower cell index.
  */
object Ann {

  /** Train centroids: seed with the nlist lowest-id vectors, then `iters`
    * Lloyd steps of (assign to nearest-by-cosine centroid, recompute
    * per-cell mean). Returns nlist × dim (cells may be empty → seed kept).
    */
  def trainCentroids(
      spark: SparkSession, corpus: DataFrame,
      nlist: Int, iters: Int = 2): Array[Array[Float]] = {
    import spark.implicits._
    var centroids: Array[Array[Float]] = corpus
      .orderBy("vec_id").limit(nlist)
      .select(col("embedding").as[Array[Float]])
      .collect()
    val dim = centroids.head.length
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, centroids)
      val sums = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0)
        next(cell)(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
      }
      centroids = next
    }
    require(centroids.forall(_.length == dim))
    centroids
  }

  /** Add an int `cell` column: argmax over centroid dot products of the
    * L2-normalized comparison (cosine order == dot order after dividing by
    * the row norm, which is constant per row — so plain dots suffice).
    */
  private def assignCells(corpus: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val dots = centroids.zipWithIndex.map { case (c, i) =>
      // argmax target: dot/|c| — the row's own norm is constant per row, so
      // this ranks identically to full cosine
      struct((Similarity.dotFast(col("embedding"), typedLit(c.toSeq)) / lit(norm2(c))).as("score"),
        lit(-i).as("negidx"))
    }
    // array_max over (score, -idx) structs = highest dot, lowest index on ties
    corpus.withColumn("cell", (-greatest(dots: _*).getField("negidx")).cast("int"))
  }

  private def norm2(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))

  /** Top-k cosine neighbors per query via IVF probe. Output matches
    * [[NearDup.knnBruteForce]]: (q_id, n_id, cos, rank) — recall < 1 when
    * a true neighbor lives in an unprobed cell (spec-bounded).
    *
    * Scale knobs:
    *  - `nlist <= 0` (the default) auto-sizes to max(16, ⌈√n⌉) — the
    *    standard IVF balance point (cells of ~√n vectors each), so a 100×
    *    corpus gets 10× the cells instead of 100× the per-cell scan.
    *  - the probe join broadcasts the query side only while the exploded
    *    (query × nprobe) row count stays under `broadcastQueryRows`; past
    *    that — e.g. an all-pairs self-search where |Q| ≈ |C| — it falls
    *    back to a shuffle equi-join on `cell`, which AQE skew-splits.
    */
  def ivfTopK(
      spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 0, nprobe: Int = 4, iters: Int = 1,
      broadcastQueryRows: Long = 500000L): DataFrame = {
    val effNlist =
      if (nlist > 0) nlist
      else {
        val n = corpus.count()
        math.max(16L, math.min(n, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
      }
    val centroids = trainCentroids(spark, corpus, effNlist, iters)
    val corpusCells = assignCells(corpus, centroids)
      .select(col("vec_id").as("n_id"), col("embedding").as("ne"),
        Similarity.normExact(col("embedding")).as("nn"), col("cell"))
    // nprobe nearest cells per query: score all nlist centroids, explode the
    // top nprobe. Sort key is (score, -cell) so ties prefer the LOWER cell
    // index — the same contract as assignCells' negidx argmax.
    val probeStructs = centroids.zipWithIndex.map { case (c, i) =>
      struct((Similarity.dotFast(col("embedding"), typedLit(c.toSeq)) / lit(norm2(c))).as("score"),
        lit(-i).as("negcell"))
    }
    val probed = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        Similarity.normExact(col("embedding")).as("qn"),
        slice(reverse(array_sort(array(probeStructs: _*))), 1, nprobe).as("probes"))
      .withColumn("probe", explode(col("probes")))
      .withColumn("cell", -col("probe.negcell"))
      .drop("probes", "probe")
    // bounded existence probe, not a full count: scanning stops once the
    // limit is exceeded, so deciding the hint never re-executes the whole
    // query-side plan (it sits on the timed path of every call)
    val probeLimit =
      math.min(broadcastQueryRows / math.max(1, nprobe) + 1, Int.MaxValue.toLong).toInt
    val broadcastable = queries
      .limit(probeLimit)
      .count() * nprobe <= broadcastQueryRows
    val probeSide = if (broadcastable) broadcast(probed) else probed
    val scored = probeSide.join(corpusCells, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qe"), col("ne")), col("qn"), col("nn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cos", "rank")
  }
}

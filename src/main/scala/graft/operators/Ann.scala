package graft.operators

import graft.functions.Similarity
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF (inverted-file) approximate nearest-neighbor search — the classic
  * cluster-then-probe scale path: partition the corpus into `nlist` Voronoi
  * cells (mini k-means over cosine), search only the `nprobe` cells nearest
  * each query. Versus [[NearDup.knnBruteForce]]'s O(|Q|·|C|) scoring, IVF
  * scores ~|Q|·|C|·nprobe/nlist — the standard recall/throughput dial.
  *
  * Spark shape: centroids are tiny (nlist × dim floats) carried inside two
  * fused native expressions ([[Ann.CentroidArgmax]] / [[Ann.CentroidTopCells]]
  * — ONE Catalyst node each regardless of nlist, so plan analysis stays O(1)
  * as the adaptive cell count grows); assignment is a per-row argmax of dot
  * products (no shuffle); the probe is an equi-join on cell id (one
  * shuffle, AQE-skew-safe); top-k is a bounded [[graft.functions.TopKAgg]]
  * aggregation (map-side partials carry ≤ k per query per partition).
  * Training is Lloyd iterations over a hash-gated ~16 k sample (expected
  * size within 2× of the bound at ANY corpus size — see [[trainSample]])
  * with per-dimension distributed means (posexplode → groupBy(cell, dim)),
  * so no vector ever aggregates on the driver beyond the nlist centroids
  * themselves and the training cost is bounded regardless of corpus size —
  * at 100 TB the only full-corpus passes are the seed scan, ONE count
  * (reused across the trainers and the gate), the sample's gate filter
  * (persisted, so not per-iteration), and the final assignment, all linear.
  *
  * Deterministic: seeds are the `nlist` lowest vec_ids; means are exact
  * decimal sums; ties in argmax break toward the lower cell index.
  */
object Ann {

  /** Nearest-centroid cell id as ONE native expression carrying the whole
    * centroid matrix — replacing the former `greatest(struct(dot_i, -i))`
    * literal tree, whose O(nlist) Catalyst nodes made analysis time (and,
    * past Janino's 64 KB method limit, codegen itself) grow with the
    * corpus under the adaptive `nlist = ⌈√n⌉` rule. One node means plan
    * build is O(1) in nlist; the loop below is the same fused-primitive
    * shape as [[Pq.PqEncode]].
    *
    * Scoring is bit-identical to the old tree: dot accumulated
    * left-to-right in double, divided by the driver-computed centroid
    * norm; ties keep the LOWEST cell index (strict `>` while scanning in
    * index order).
    */
  case class CentroidArgmax(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_centroid_argmax"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    @transient private lazy val norms: Array[Double] = centroids.map(Ann.norm2)

    // Double.compare, not >: replicates the old greatest()-tree NaN
    // ordering (NaN sorts greatest in Spark), so a NaN embedding or a
    // zero-norm centroid degrades deterministically instead of diverging
    // from the replaced implementation. eval and codegen share this one
    // kernel so the two paths cannot drift.
    override def nullSafeEval(input: Any): Any =
      Ann.centroidArgmax(input.asInstanceOf[ArrayData], centroids, norms)

    // generated code is a CALL into the same static kernel, with the
    // centroid matrix carried in the codegen references array: the
    // expression stays inside whole-stage codegen (no per-row
    // CodegenFallback boxing), the method body stays a single JIT-compiled
    // loop regardless of nlist, and Janino never sees an unrolled matrix
    // (64 KB method limit)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
        val ns = ctx.addReferenceObj("norms", norms, "double[]")
        s"${ev.value} = graft.operators.Ann.centroidArgmax($v, $cents, $ns);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[CentroidArgmax]]. */
  def centroidArgmax(
      v: ArrayData, centroids: Array[Array[Float]], norms: Array[Double]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var dot = 0.0
      var d = 0
      val n = math.min(v.numElements(), c.length)
      while (d < n) {
        dot += v.getFloat(d).toDouble * c(d).toDouble
        d += 1
      }
      val score = dot / norms(i)
      if (java.lang.Double.compare(score, bestScore) > 0) { bestScore = score; best = i }
      i += 1
    }
    best
  }

  /** The `nprobe` nearest cells per query vector, ordered (score DESC,
    * cell ASC) — the probe-side twin of [[CentroidArgmax]], replacing the
    * former `slice(reverse(array_sort(array(struct_0..struct_nlist))))`
    * tree. Partial selection keeps it O(nlist · nprobe) with nprobe tiny.
    */
  case class CentroidTopCells(
      child: Expression, centroids: Array[Array[Float]], nprobe: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_centroid_top_cells"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    @transient private lazy val norms: Array[Double] = centroids.map(Ann.norm2)

    override def nullSafeEval(input: Any): Any =
      Ann.centroidTopCells(input.asInstanceOf[ArrayData], centroids, norms, nprobe)

    // same kernel-call codegen shape as CentroidArgmax
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
        val ns = ctx.addReferenceObj("norms", norms, "double[]")
        s"${ev.value} = graft.operators.Ann.centroidTopCells($v, $cents, $ns, $nprobe);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[CentroidTopCells]]. */
  def centroidTopCells(v: ArrayData, centroids: Array[Array[Float]],
      norms: Array[Double], nprobe: Int): ArrayData = {
    val nlist = centroids.length
    val scores = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      val c = centroids(i)
      var dot = 0.0
      var d = 0
      val n = math.min(v.numElements(), c.length)
      while (d < n) {
        dot += v.getFloat(d).toDouble * c(d).toDouble
        d += 1
      }
      scores(i) = dot / norms(i)
      i += 1
    }
    val out = new Array[Int](math.min(nprobe, nlist))
    val taken = new Array[Boolean](nlist)
    var p = 0
    while (p < out.length) {
      var best = -1
      var j = 0
      while (j < nlist) {
        // Double.compare in index order: lowest cell on score ties, NaN
        // treated as greatest — the old (score, -cell) struct-sort
        // contract (plain > would skip NaN cells and leave best = -1,
        // crashing on taken(-1) once only NaN scores remain)
        if (!taken(j) &&
            (best < 0 || java.lang.Double.compare(scores(j), scores(best)) > 0)) {
          best = j
        }
        j += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic hash-gated training sample: expected size in
    * [maxTrain, 2·maxTrain) for any corpus up to ~maxTrain·2⁴⁰ rows. The
    * gate modulus is 2⁴⁰, NOT 10⁶ — a 10⁶ modulus floors the pass rate at
    * one-in-a-million, so past n = 10⁶·maxTrain the "bounded" sample grows
    * again as n/10⁶ (61× maxTrain at 10¹² rows). Pure function of the id:
    * reproducible run-to-run and stable under repartitioning.
    */
  private[operators] def trainSample(
      corpus: DataFrame, idCol: String, n: Long, maxTrain: Long): DataFrame = {
    val gate = 1L << 40
    // ceiling division, and BigInt because gate·maxTrain overflows Long for
    // maxTrain ≳ 8e6: expected kept = n·thr/2⁴⁰ ∈ [maxTrain, maxTrain + n/2⁴⁰)
    // — floor division would land on the LOW side of the bound (down to
    // maxTrain/2 near divisor boundaries)
    val thr = ((BigInt(gate) * maxTrain + n - 1) / n).toLong.max(1L)
    corpus.filter(pmod(xxhash64(col(idCol)), lit(gate)) < lit(thr))
  }

  /** Train centroids: seed with the nlist lowest-id vectors, then `iters`
    * Lloyd steps of (assign to nearest-by-cosine centroid, recompute
    * per-cell mean). Returns nlist × dim (cells may be empty → seed kept).
    *
    * Lloyd iterations run on a deterministic hash-gated [[trainSample]]
    * of ~`maxTrain` vectors, persisted for the duration of training:
    * centroid estimates need ~10³ vectors per cell, not the corpus, and
    * the per-iteration `posexplode` otherwise generates n·dim
    * intermediate rows — at 1 B × 768-dim that is ~10¹² rows per pass
    * for centroids a 16 k sample estimates just as well. Seeds stay the
    * nlist lowest vec_ids of the FULL corpus, and the gate is a pure
    * function of vec_id, so training is reproducible run-to-run and
    * corpora at or under `maxTrain` rows (every current fixture) train
    * bit-identically to the unsampled implementation. Pass `knownCount`
    * when the caller already counted the corpus (ivfTopK/pqTopK do) so
    * training adds no extra full pass beyond the seed scan.
    */
  def trainCentroids(
      spark: SparkSession, corpus: DataFrame,
      nlist: Int, iters: Int = 2, maxTrain: Long = 16384L,
      knownCount: Long = -1L): Array[Array[Float]] = {
    import spark.implicits._
    var centroids: Array[Array[Float]] = corpus
      .orderBy("vec_id").limit(nlist)
      .select(col("embedding").as[Array[Float]])
      .collect()
    val dim = centroids.head.length
    val n = if (knownCount >= 0L) knownCount else corpus.count()
    val sampled = n > maxTrain
    // persist the (tiny) sample: without it every Lloyd iteration re-runs
    // the full upstream pipeline through the hash gate
    val trainSet =
      if (sampled)
        trainSample(corpus, "vec_id", n, maxTrain)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else corpus
    try {
      for (_ <- 0 until iters) {
        val assigned = assignCells(trainSet, centroids)
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
    } finally if (sampled) trainSet.unpersist()
    require(centroids.forall(_.length == dim))
    centroids
  }

  /** Add an int `cell` column: argmax over centroid dot products of the
    * L2-normalized comparison (cosine order == dot order after dividing by
    * the row norm, which is constant per row — so plain dots suffice).
    */
  private[operators] def assignCells(corpus: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    // argmax target: dot/|c| — the row's own norm is constant per row, so
    // this ranks identically to full cosine
    corpus.withColumn("cell", GraftColumnBridge.column(
      CentroidArgmax(GraftColumnBridge.expression(col("embedding")), centroids)))

  /** The IVF cell-count rule shared by [[ivfTopK]] and [[Pq.pqTopK]]:
    * explicit `nlist` wins; otherwise ⌈√n⌉ (cells of ~√n vectors — the
    * standard balance point between per-cell scan and probe fan-out),
    * floored at 16 and capped at 4096. The cap bounds the per-row
    * assignment cost (O(nlist·dim) flops) and the size of the centroid
    * matrix carried in the fused expressions — past ~16 M vectors raise
    * nlist explicitly.
    */
  /** Hook for callers that persist trained centroids across sessions
    * (q32/q70 route this to the content-keyed Artifacts cache): given a
    * version string naming the training knobs and the trainer thunk,
    * return the centroids — from cache or by invoking the thunk. The
    * default trains unconditionally (library callers with no cache).
    */
  type CentroidStore = (String, () => Array[Array[Float]]) => Array[Array[Float]]
  val NoStore: CentroidStore = (_, build) => build()

  private[operators] def effectiveNlist(n: Long, nlist: Int): Int =
    if (nlist > 0) nlist
    else
      math.min(4096L,
        math.max(16L, math.min(n, math.ceil(math.sqrt(n.toDouble)).toLong))).toInt

  /** Broadcast the probe side only while the exploded (query × nprobe) row
    * count stays under `broadcastQueryRows` — decided with a bounded
    * existence probe (scanning stops at the limit), so the check never
    * re-executes the whole query-side plan on the timed path.
    */
  private[operators] def broadcastableQuerySide(
      queries: DataFrame, nprobe: Int, broadcastQueryRows: Long): Boolean = {
    val probeLimit =
      math.min(broadcastQueryRows / math.max(1, nprobe) + 1, Int.MaxValue.toLong).toInt
    queries.limit(probeLimit).count() * nprobe <= broadcastQueryRows
  }

  private[operators] def norm2(v: Array[Float]): Double =
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
      broadcastQueryRows: Long = 500000L,
      centroidStore: CentroidStore = NoStore): DataFrame = {
    val n = corpus.count() // the one counting pass — threaded through
    val nl = effectiveNlist(n, nlist)
    val centroids = centroidStore(s"nlist$nl-i$iters",
      () => trainCentroids(spark, corpus, nl, iters, knownCount = n))
    val corpusCells = assignCells(corpus, centroids)
      .select(col("vec_id").as("n_id"), col("embedding").as("ne"),
        Similarity.normExact(col("embedding")).as("nn"), col("cell"))
    // nprobe nearest cells per query, (score DESC, cell ASC) — one fused
    // expression over the centroid matrix, same tie contract as assignCells
    val probed = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        Similarity.normExact(col("embedding")).as("qn"),
        explode(GraftColumnBridge.column(CentroidTopCells(
          GraftColumnBridge.expression(col("embedding")), centroids, nprobe))).as("cell"))
    val probeSide =
      if (broadcastableQuerySide(queries, nprobe, broadcastQueryRows)) broadcast(probed)
      else probed
    // each corpus vector lives in exactly one cell and a query's probed
    // cells are distinct (CentroidTopCells emits each index once), so
    // (q_id, n_id) pairs are already unique — no dedup shuffle needed
    // before the bounded top-k aggregation (same invariant as Pq.pqTopK)
    val scored = probeSide.join(corpusCells, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qe"), col("ne")), col("qn"), col("nn")))
    // bounded top-k aggregation, not a window: a window would shuffle
    // every probed candidate row; TopKAgg's map-side partials carry ≤ k
    // per query per partition (same (cos DESC, n_id ASC) order contract)
    val topkFn = graft.functions.TopKAgg.topK(k)
    scored.groupBy("q_id")
      .agg(topkFn(col("cos"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"), col("t.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}

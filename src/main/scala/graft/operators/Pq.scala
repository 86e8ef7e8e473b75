package graft.operators

import graft.functions.Similarity
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product quantization (PQ) for embedding search — the memory/shuffle
  * scale path that complements LSH (q24) and IVF (q32): each vector
  * compresses to M sub-space codeword ids (here 8 bytes for a 64-dim
  * float vector, a 32× reduction), and query scoring becomes M table
  * lookups per candidate (asymmetric distance computation) instead of a
  * 64-float dot product. At 100 TB the CODES table is what shuffles and
  * caches; raw embeddings are only touched to re-rank survivors.
  *
  * Spark shape mirrors [[Ann]]: codebooks are tiny (M·ksub·dsub floats)
  * driver-side literals trained with a few distributed Lloyd passes per
  * sub-space (decimal-exact means, deterministic lowest-id seeds,
  * hash-gated training sample); encoding, table build, and ADC scoring
  * are single fused native expressions (per-element HOF lookups were the
  * round-1 27× lesson; literal expression TREES cost seconds of Catalyst
  * analysis per plan, so one node replaces each 128-node tree).
  */
object Pq {

  /** score = Σ_m table[m·ksub + codes[m]] — the ADC lookup as ONE native
    * expression over (per-query table array, per-candidate code array).
    */
  case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_pq_adc_score"
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(IntegerType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    // eval and codegen share one static kernel (the hottest expression in
    // the ADC scan: one call per probed (query, candidate) pair)
    override def nullSafeEval(table: Any, codes: Any): Any =
      Pq.adcScoreKernel(
        table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ksub)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, c) =>
        s"${ev.value} = graft.operators.Pq.adcScoreKernel($t, $c, $ksub);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Shared eval/codegen kernel for [[PqAdcScore]]. */
  def adcScoreKernel(t: ArrayData, c: ArrayData, ksub: Int): Double = {
    val tn = t.numElements()
    var s = 0.0
    var m = 0
    val n = c.numElements()
    while (m < n) {
      val idx = m * ksub + c.getInt(m)
      require(idx >= 0 && idx < tn,
        s"ADC code ${c.getInt(m)} out of range for table of $tn entries (ksub=$ksub)")
      s += t.getDouble(idx)
      m += 1
    }
    s
  }

  private def adcScore(table: Column, codes: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdcScore(
      GraftColumnBridge.expression(table), GraftColumnBridge.expression(codes), ksub))

  /** All M codes in one fused primitive loop (argmin L2 per sub-space,
    * lower index on ties). One expression node instead of a
    * greatest-of-128-structs literal tree — the big trees were costing
    * seconds of Catalyst analysis PER LLOYD ITERATION, dwarfing the
    * actual compute (the round-1 fused-vector-loop lesson, applied to
    * plan-build time).
    */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_pq_encode"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    @transient private lazy val halfNorms: Array[Array[Double]] =
      codebooks.map(_.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x) / 2.0))

    override def nullSafeEval(input: Any): Any =
      Pq.encodeKernel(input.asInstanceOf[ArrayData], codebooks, halfNorms)

    // kernel-call codegen with the codebook tensor in the references
    // array — see Ann.CentroidArgmax for the pattern rationale
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
        val hn = ctx.addReferenceObj("halfNorms", halfNorms, "double[][]")
        s"${ev.value} = graft.operators.Pq.encodeKernel($v, $cb, $hn);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[PqEncode]]. */
  def encodeKernel(v: ArrayData, codebooks: Array[Array[Array[Float]]],
      halfNorms: Array[Array[Double]]): ArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    require(v.numElements() >= m * dsub,
      s"embedding has ${v.numElements()} dims, codebooks need ${m * dsub}")
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < codebooks(sub).length) {
        val c = codebooks(sub)(j)
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          dot += v.getFloat(sub * dsub + d).toDouble * c(d)
          d += 1
        }
        val score = dot - halfNorms(sub)(j)
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC lookup table (M·ksub dot products) in one fused loop. */
  case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def prettyName: String = "graft_pq_adc_table"
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Pq.adcTableKernel(input.asInstanceOf[ArrayData], codebooks)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
        s"${ev.value} = graft.operators.Pq.adcTableKernel($v, $cb);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared eval/codegen kernel for [[PqAdcTable]]. */
  def adcTableKernel(v: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(v.numElements() >= m * dsub,
      s"embedding has ${v.numElements()} dims, codebooks need ${m * dsub}")
    val table = new Array[Double](m * ksub)
    var sub = 0
    while (sub < m) {
      var j = 0
      while (j < ksub) {
        val c = codebooks(sub)(j)
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          dot += v.getFloat(sub * dsub + d).toDouble * c(d)
          d += 1
        }
        table(sub * ksub + j) = dot
        j += 1
      }
      sub += 1
    }
    new GenericArrayData(table)
  }

  /** Train per-sub-space codebooks: M sub-spaces of dsub dims, ksub
    * codewords each, seeded from the lowest-vec_id subvectors and refined
    * with `iters` Lloyd steps (L2 assignment, decimal-exact means).
    * Returns codebooks(m)(j) = codeword j of sub-space m.
    */
  /** [[Ann.CentroidStore]]'s codebook twin — persistence hook for the
    * trained PQ codebooks (m × ksub × dsub). */
  type CodebookStore = (String, () => Array[Array[Array[Float]]]) => Array[Array[Array[Float]]]
  val NoCodebookStore: CodebookStore = (_, build) => build()

  def trainCodebooks(spark: SparkSession, corpus: DataFrame, m: Int, ksub: Int,
      iters: Int = 2, knownCount: Long = -1L): Array[Array[Array[Float]]] = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dim = corpus.select(size(col("embedding"))).as[Int].head()
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val dsub = dim / m
    val seeds = corpus.orderBy("vec_id").limit(ksub)
      .select(col("embedding").as[Array[Float]]).collect()
    require(seeds.length == ksub, s"corpus smaller than ksub=$ksub")
    // codebooks need ~10³ vectors per codeword, not the whole corpus:
    // train on a deterministic hash-gated sample ([[Ann.trainSample]] —
    // 2⁴⁰ gate modulus, expected size within 2× of maxTrain at ANY corpus
    // size) so the Lloyd explode cost is bounded (the encode pass that
    // follows still covers every vector); persisted so iterations don't
    // re-run the upstream pipeline through the gate
    val maxTrain = 16384L
    val n = if (knownCount >= 0L) knownCount else corpus.count()
    val sampled = n > maxTrain
    val trainSet =
      if (sampled)
        Ann.trainSample(corpus, "vec_id", n, maxTrain)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else corpus
    var codebooks: Array[Array[Array[Float]]] = (0 until m).toArray.map { sub =>
      seeds.map(_.slice(sub * dsub, (sub + 1) * dsub))
    }
    // ONE distributed job per Lloyd iteration for ALL sub-spaces: encode,
    // explode every dimension, route it to (sub-space, codeword, local dim)
    // and take decimal-exact means — m·ksub·dsub tiny rows to the driver
    try for (_ <- 0 until iters) {
      val sums = encode(trainSet, codebooks)
        .select(col("codes"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(
          (col("dim") / dsub).cast("int").as("sub"),
          (col("dim") % dsub).cast("int").as("d"),
          element_at(col("codes"), (col("dim") / dsub).cast("int") + 1).as("code"),
          col("v"))
        .groupBy("sub", "code", "d")
        .agg(sum(col("v").cast("double").cast(DecimalType(38, 20)))
          .cast("double").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          (r.getDouble(3) / r.getLong(4)).toFloat
      }
      codebooks = next
    } finally if (sampled) trainSet.unpersist()
    codebooks
  }

  /** Add `codes`: array<int> of length M — the PQ encoding (argmin L2 per
    * sub-space via [[PqEncode]]'s fused loop).
    */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Float]]]): DataFrame =
    corpus.withColumn("codes", GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(col("embedding")), codebooks)))

  /** Top-k by ADC over PQ codes with exact cosine re-rank of the
    * `refine`·k approximate survivors — IVF-PQ composition: the ADC scan is
    * routed through [[Ann]] cells (equi-join on `cell`), so each query
    * scores only ~nprobe/nlist of the corpus codes instead of the former
    * flat `crossJoin` over every code. At 100 TB that routing is the
    * difference between a full-corpus scan per query batch and touching a
    * bounded slice of it; recall is spec-bounded (AnnSpec) and tunable via
    * `nprobe`. One broadcast of the (tiny) query side carrying its lookup
    * tables; candidates shuffle only codes + one int cell id.
    */
  def pqTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2, refine: Int = 4,
      nlist: Int = 0, nprobe: Int = 8,
      broadcastQueryRows: Long = 500000L,
      codebookStore: CodebookStore = NoCodebookStore,
      centroidStore: Ann.CentroidStore = Ann.NoStore): DataFrame = {
    val n = corpus.count() // one counting pass, threaded into both trainers
    val nl = Ann.effectiveNlist(n, nlist)
    val codebooks = codebookStore(s"m$m-k$ksub-i$iters",
      () => trainCodebooks(spark, corpus, m, ksub, iters, knownCount = n))
    val centroids = centroidStore(s"nlist$nl-i1",
      () => Ann.trainCentroids(spark, corpus, nl, iters = 1, knownCount = n))
    // SLIM approximate phase: only (ids, codes, cell, tables) flow through
    // the scan and the top-(k·refine) window — never the embeddings, whose
    // 2M wide rows would dominate the sort (the round-1 slim-shuffle lesson)
    val encoded = encode(Ann.assignCells(corpus, centroids), codebooks)
      .select(col("vec_id").as("n_id"), col("codes"), col("cell"))
    // per-query ADC table + the nprobe nearest cells (one fused expression
    // each); exploding cells up front keeps the probe an equi-join
    val q = queries.select(col("vec_id").as("q_id"),
      GraftColumnBridge.column(PqAdcTable(
        GraftColumnBridge.expression(col("embedding")), codebooks)).as("adc_table"),
      explode(GraftColumnBridge.column(Ann.CentroidTopCells(
        GraftColumnBridge.expression(col("embedding")), centroids, nprobe))).as("cell"))
    // bounded top-(k·refine) aggregation, not a window: the window would
    // shuffle every ADC-scored candidate row; TopKAgg's partials carry
    // ≤ k·refine per query per partition (same order contract)
    val approxTopK = graft.functions.TopKAgg.topK(k * refine)
    // broadcast the exploded query side only while it stays small, else
    // let the equi-join shuffle on cell (AQE skew-splits)
    val qSide =
      if (Ann.broadcastableQuerySide(queries, nprobe, broadcastQueryRows)) broadcast(q)
      else q
    // each corpus vector lives in exactly one cell and a query's probed
    // cells are distinct, so (q_id, n_id) pairs are already unique
    val survivors = qSide.join(encoded, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        adcScore(col("adc_table"), col("codes"), ksub).as("approx_dot"))
      .groupBy("q_id")
      .agg(approxTopK(col("approx_dot"), col("n_id")).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("n_id"))
    // re-attach vectors only for the |Q|·k·refine survivors, exact re-rank
    val qv = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
      Similarity.normExact(col("embedding")).as("qn"))
    val cv = corpus.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
      Similarity.normExact(col("embedding")).as("nn"))
    val exactTopK = graft.functions.TopKAgg.topK(k)
    survivors
      .join(broadcast(qv), "q_id")
      .join(cv, "n_id") // survivors are tiny — AQE broadcasts them into the corpus scan
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qe"), col("ne")), col("qn"), col("nn")))
      .groupBy("q_id")
      .agg(exactTopK(col("cos"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"), col("t.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}

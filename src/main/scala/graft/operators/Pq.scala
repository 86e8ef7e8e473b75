package graft.operators

import graft.functions.Similarity
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  * sub-space (decimal-exact means, deterministic lowest-id seeds);
  * encoding is a codegen'd argmax over codeword dot products per
  * sub-space (no shuffle); ADC scoring is a native row-granularity
  * expression (per-element HOF lookups were the round-1 27× lesson).
  */
object Pq {

  /** score = Σ_m table[m·ksub + codes[m]] — the ADC lookup as ONE native
    * expression over (per-query table array, per-candidate code array).
    */
  case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression with CodegenFallback {
    override def prettyName: String = "graft_pq_adc_score"
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(table: Any, codes: Any): Any = {
      val t = table.asInstanceOf[ArrayData]
      val c = codes.asInstanceOf[ArrayData]
      var s = 0.0
      var m = 0
      val n = c.numElements()
      while (m < n) {
        s += t.getDouble(m * ksub + c.getInt(m))
        m += 1
      }
      s
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  private def adcScore(table: Column, codes: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdcScore(
      GraftColumnBridge.expression(table), GraftColumnBridge.expression(codes), ksub))

  /** Train per-sub-space codebooks: M sub-spaces of dsub dims, ksub
    * codewords each, seeded from the lowest-vec_id subvectors and refined
    * with `iters` Lloyd steps (L2 assignment, decimal-exact means).
    * Returns codebooks(m)(j) = codeword j of sub-space m.
    */
  def trainCodebooks(spark: SparkSession, corpus: DataFrame, m: Int, ksub: Int,
      iters: Int = 2): Array[Array[Array[Float]]] = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dim = corpus.select(size(col("embedding"))).as[Int].head()
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val dsub = dim / m
    val seeds = corpus.orderBy("vec_id").limit(ksub)
      .select(col("embedding").as[Array[Float]]).collect()
    require(seeds.length == ksub, s"corpus smaller than ksub=$ksub")
    (0 until m).toArray.map { sub =>
      var codebook: Array[Array[Float]] =
        seeds.map(_.slice(sub * dsub, (sub + 1) * dsub))
      val subCol = slice(col("embedding"), sub * dsub + 1, dsub)
      for (_ <- 0 until iters) {
        val assigned = corpus.withColumn("code",
          nearestCode(subCol, codebook))
        val sums = assigned
          .select(col("code"), posexplode(subCol).as(Seq("d", "v")))
          .groupBy("code", "d")
          .agg(sum(col("v").cast("double").cast(DecimalType(38, 20)))
            .cast("double").as("s"), count(lit(1)).as("n"))
          .collect()
        val next = codebook.map(_.clone())
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
        }
        codebook = next
      }
      codebook
    }
  }

  /** argmin_j ‖x − c_j‖² = argmax_j (dot(x, c_j) − ‖c_j‖²/2), as a
    * greatest-of-structs with lower-index tie-break (the [[Ann]] negidx
    * contract).
    */
  private def nearestCode(sub: Column, codebook: Array[Array[Float]]): Column = {
    val scored = codebook.zipWithIndex.map { case (c, j) =>
      val c2 = c.foldLeft(0.0)((a, x) => a + x.toDouble * x)
      struct((Similarity.dotFast(sub, typedLit(c.toSeq)) - lit(c2 / 2.0)).as("score"),
        lit(-j).as("negidx"))
    }
    (-greatest(scored: _*).getField("negidx")).cast("int")
  }

  /** Add `codes`: array<int> of length M — the PQ encoding. */
  def encode(corpus: DataFrame, codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val dsub = codebooks(0)(0).length
    val codeCols = codebooks.zipWithIndex.map { case (cb, sub) =>
      nearestCode(slice(col("embedding"), sub * dsub + 1, dsub), cb)
    }
    corpus.withColumn("codes", array(codeCols: _*))
  }

  /** Top-k by ADC over PQ codes with exact cosine re-rank of the
    * `refine`·k approximate survivors. One broadcast of the (tiny) query
    * side carrying its lookup tables; candidates shuffle only codes.
    */
  def pqTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 2, refine: Int = 4): DataFrame = {
    val codebooks = trainCodebooks(spark, corpus, m, ksub, iters)
    val dsub = codebooks(0)(0).length
    val encoded = encode(corpus, codebooks)
      .select(col("vec_id").as("n_id"), col("codes"), col("embedding").as("ne"),
        Similarity.normExact(col("embedding")).as("nn"))
    // per-query ADC table: entry m*ksub+j = dot(q_sub_m, codeword_j of m)
    val tableEntries = for {
      sub <- codebooks.indices
      j <- 0 until ksub
    } yield Similarity.dotFast(
      slice(col("embedding"), sub * dsub + 1, dsub),
      typedLit(codebooks(sub)(j).toSeq))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
      Similarity.normExact(col("embedding")).as("qn"),
      array(tableEntries: _*).as("adc_table"))
    val approx = broadcast(q).crossJoin(encoded)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("approx_dot", adcScore(col("adc_table"), col("codes"), ksub))
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("approx_dot").desc, col("n_id").asc)
    val survivors = approx.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= k * refine)
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    survivors
      .withColumn("cos", Similarity.cosineFromParts(
        Similarity.dotExact(col("qe"), col("ne")), col("qn"), col("nn")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cos", "rank")
  }
}

package graft

import graft.expressions.TextSketchExprs
import graft.operators.{Ann, Pq}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** The fused ANN/PQ/sketch expressions implement doGenCode as a
  * static-kernel call — these tests pin that they actually COMPILE and run
  * inside whole-stage codegen (fallback=false turns a silent Janino
  * degradation into a failure) and that the codegen path produces
  * bit-identical results to the interpreted eval path.
  */
class CodegenSpec extends SparkSpec {

  private def codegenOf(df: DataFrame): String =
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)

  /** Rows collected with whole-stage codegen + no-fallback vs TRULY
    * interpreted eval. The interpreted leg must pin factoryMode=NO_CODEGEN:
    * wholeStage=false alone still compiles expressions through
    * GenerateUnsafeProjection (doGenCode), so without it the "drift check"
    * would compare the kernel against itself and an eval-vs-codegen
    * divergence in any expression would sail through.
    */
  private def bothPaths(df: => DataFrame): (Array[String], Array[String]) = {
    def collectWith(wholeStage: Boolean, fallback: Boolean, factory: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      spark.conf.set("spark.sql.codegen.fallback", fallback.toString)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
      try df.collect().map(_.toString).sorted
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.fallback", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    (collectWith(wholeStage = true, fallback = false, factory = "CODEGEN_ONLY"),
      collectWith(wholeStage = false, fallback = true, factory = "NO_CODEGEN"))
  }

  private val centroids: Array[Array[Float]] =
    Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0.5f, 0.5f, 0f, 1f))

  private val codebooks: Array[Array[Array[Float]]] =
    Array(
      Array(Array(0f, 0f), Array(1f, 1f), Array(-1f, 0.5f)),
      Array(Array(0.25f, -0.25f), Array(2f, 0f), Array(0f, 3f)))

  private def vecs: DataFrame = {
    val dims = (0 until 4).map(d =>
      ((pmod(xxhash64(col("id") * 4 + d), lit(1000L)) - 500L) / 500.0).cast("float"))
    spark.range(64).select(col("id").as("vec_id"), array(dims: _*).as("embedding"))
  }

  test("ANN/PQ expressions: kernel calls present in generated code, codegen == interpreted") {
    def df = vecs
      .withColumn("cell", GraftColumnBridge.column(Ann.CentroidArgmax(
        GraftColumnBridge.expression(col("embedding")), centroids)))
      .withColumn("cells", GraftColumnBridge.column(Ann.CentroidTopCells(
        GraftColumnBridge.expression(col("embedding")), centroids, nprobe = 2)))
      .withColumn("codes", GraftColumnBridge.column(Pq.PqEncode(
        GraftColumnBridge.expression(col("embedding")), codebooks)))
      .withColumn("adc_table", GraftColumnBridge.column(Pq.PqAdcTable(
        GraftColumnBridge.expression(col("embedding")), codebooks)))
      .withColumn("adc", GraftColumnBridge.column(Pq.PqAdcScore(
        GraftColumnBridge.expression(col("adc_table")),
        GraftColumnBridge.expression(col("codes")), ksub = 3)))
    val cg = codegenOf(df)
    for (kernel <- Seq(
        "graft.operators.Ann.centroidArgmax", "graft.operators.Ann.centroidTopCells",
        "graft.operators.Pq.encodeKernel", "graft.operators.Pq.adcTableKernel",
        "graft.operators.Pq.adcScoreKernel"))
      assert(cg.contains(kernel), s"generated code lacks $kernel:\n$cg")
    val (gen, interp) = bothPaths(df)
    assert(gen === interp)
    assert(gen.length === 64)
  }

  test("MinHashSig/SimHash64: kernel calls present, codegen == interpreted, empty -> null") {
    def df = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("shingles", TextSketchExprs.wordShingles(col("toks"), 3))
      .withColumn("sig", TextSketchExprs.minhashSig(col("shingles"), 16))
      .withColumn("sim", TextSketchExprs.simhash64(col("toks")))
      .select("doc_id", "sig", "sim")
    val cg = codegenOf(df)
    for (kernel <- Seq(
        "graft.expressions.TextSketchExprs.minHashKernel",
        "graft.expressions.TextSketchExprs.simHashKernel"))
      assert(cg.contains(kernel), s"generated code lacks $kernel:\n$cg")
    val (gen, interp) = bothPaths(df)
    assert(gen === interp)

    // empty shingle array must yield NULL on the codegen path too
    def empty = spark.range(1)
      .select(array().cast("array<string>").as("shingles"))
      .withColumn("sig", TextSketchExprs.minhashSig(col("shingles"), 8))
      .select("sig")
    val (genE, interpE) = bothPaths(empty)
    assert(genE === interpE)
    assert(genE.head === "[null]")
  }

  test("WordShingles/Winnow/RepetitionStats/Bloom: codegen'd and path-identical") {
    def docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    def df = docs
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("shingles", TextSketchExprs.wordShingles(col("toks"), 3))
      .withColumn("fps", graft.expressions.WinnowExpr.winnowFingerprints(
        lower(col("text")), k = 5, w = 4))
      .withColumn("rep", graft.expressions.RepetitionStats.repetitionStats(col("toks")))
      .select("doc_id", "shingles", "fps", "rep")
    val cg = codegenOf(df)
    for (kernel <- Seq(
        "graft.expressions.TextSketchExprs.shinglesKernel",
        "graft.expressions.WinnowExpr.winnowKernel",
        "graft.expressions.RepetitionStats.statsKernel"))
      assert(cg.contains(kernel), s"generated code lacks $kernel:\n$cg")
    val (gen, interp) = bothPaths(df)
    assert(gen === interp)
    assert(gen.length === 50)

    // bloom prefilter over a long key: mightContainLong resolved at codegen
    // time, no false negatives vs the exact semi-join
    def dim = Tables.nation(spark, "/root/testdata/sf0.001")
      .filter(col("n_nationkey") < 5).select("n_nationkey")
    def bloomed = graft.operators.BloomSemiJoin.prefilter(
      Tables.customer(spark, "/root/testdata/sf0.001"), "c_nationkey",
      dim, "n_nationkey", expectedKeys = 5L)
      .select("c_custkey", "c_nationkey")
    val cgB = codegenOf(bloomed)
    assert(cgB.contains("mightContainLong"), s"bloom probe not codegen'd:\n$cgB")
    val (genB, interpB) = bothPaths(bloomed)
    assert(genB === interpB)
    val exact = Tables.customer(spark, "/root/testdata/sf0.001")
      .filter(col("c_nationkey") < 5).select("c_custkey", "c_nationkey")
      .collect().map(_.toString).toSet
    assert(exact.subsetOf(genB.toSet), "bloom prefilter dropped a true match")
  }

  test("JaroWinkler: kernel call codegen'd, codegen == interpreted, known values") {
    // plain projection: a non-equi self-join would plan as BNLJ, which has
    // no whole-stage-codegen subtree to inspect
    def df = Tables.part(spark, "/root/testdata/sf0.001").limit(60)
      .select(col("p_partkey"),
        graft.functions.TextFunctions.jaroWinkler(
          col("p_name"), reverse(col("p_name"))).as("jw"),
        graft.functions.TextFunctions.jaroWinkler(
          col("p_name"), col("p_type")).as("jw2"))
    val cg = codegenOf(df)
    assert(cg.contains("graft.expressions.StringSimExprs.jaroWinklerKernel"),
      s"generated code lacks the JW kernel:\n${cg.take(2000)}")
    val (gen, interp) = bothPaths(df)
    assert(gen === interp)
    // DuckDB-pinned boundary values (probed, not assumed — see the
    // expression scaladoc)
    import graft.expressions.StringSimExprs.jaroWinklerKernel
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(jaroWinklerKernel(u("martha"), u("marhta")) === 0.9611111111111111)
    assert(jaroWinklerKernel(u("dixon"), u("dicksonx")) === 0.8133333333333332)
    assert(jaroWinklerKernel(u("abcvwxyz"), u("cabvwxyz")) === 0.9583333333333334)
    assert(jaroWinklerKernel(u("abcdex"), u("abcdey")) === 0.9333333333333333)
    assert(jaroWinklerKernel(u("ab"), u("ba")) === 0.0)
    assert(jaroWinklerKernel(u(""), u("")) === 0.0)
    assert(jaroWinklerKernel(u("ab"), u("az")) === 0.6666666666666666)
  }

  test("HilbertIndex: loop generated inline, codegen == interpreted, 12-bit analyzes") {
    def df = spark.range(256).select(
      col("id"),
      graft.expressions.HilbertIndex((col("id") % 16), (col("id") / 16).cast("long"), 4).as("h4"),
      graft.expressions.HilbertIndex(col("id") * 13 % 4096, col("id") * 7 % 4096, 12).as("h12"))
    val cg = codegenOf(df)
    assert(cg.contains("ghS"), s"hilbert loop not generated inline:\n$cg")
    val (gen, interp) = bothPaths(df)
    assert(gen === interp)
    assert(gen.length === 256)
  }
}

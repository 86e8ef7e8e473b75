package graft

import graft.functions.GraftFunctions

/** The native expressions are reachable from SQL with identical results to
  * the Scala column API.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the column API") {
    GraftFunctions.registerAll(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), "the quick brown fox jumps"))
      .toDF("a", "b", "text").createOrReplaceTempView("v")
    val r = spark.sql("""
      SELECT graft_dot_double(a, b) AS dot,
             graft_dot_decimal(a, b) AS dotx,
             graft_simhash64(split(text, ' ')) AS sh,
             size(graft_word_shingles(split(text, ' '), 3)) AS n_shingles,
             size(graft_minhash_sig(graft_word_shingles(split(text, ' '), 3), 64)) AS n_sig,
             size(graft_winnow_fingerprints(text, 8, 4)) AS n_fp
      FROM v""").head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 32.0)
    assert(r.getLong(2) !== 0L)
    assert(r.getInt(3) === 3)
    assert(r.getInt(4) === 64)
    assert(r.getInt(5) > 0)
  }

  test("array<double> SQL input implicit-casts to float instead of corrupting") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("constant integer parameters accept unfolded expressions, reject junk") {
    GraftFunctions.registerAll(spark)
    Seq(Tuple1("one two three four")).toDF("text").createOrReplaceTempView("v2")
    val n = spark.sql(
      "SELECT size(graft_word_shingles(split(text, ' '), 1 + 2)) FROM v2").head().getInt(0)
    assert(n === 2)
    val err = intercept[Exception](
      spark.sql("SELECT graft_word_shingles(split(text, ' '), text) FROM v2").head())
    assert(err.getMessage.contains("constant integer"))
    val neg = intercept[Exception](
      spark.sql("SELECT graft_word_shingles(split(text, ' '), -1) FROM v2").head())
    assert(neg.getMessage.contains(">= 1"))
  }

  test("GraftSparkExtensions injects the full function set without error") {
    // spark.sql.extensions is a static conf — applied only when a fresh
    // SparkContext comes up, so end-to-end coverage of the SQL surface
    // lives in the registerAll tests above; here we exercise the
    // build-time injection hook itself.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    val names = graft.functions.GraftFunctions.functionSet.map(_._1.funcName)
    assert(names.size === 7 && names.distinct.size === 7)
    // every builder produces a well-formed expression from dummy args
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(64)
    val (_, _, minhash) = graft.functions.GraftFunctions.functionSet
      .find(_._1.funcName == "graft_minhash_sig").get
    assert(minhash(Seq(lit, lit)).isInstanceOf[
      graft.expressions.TextSketchExprs.MinHashSig])
  }

  test("graft_hilbert is callable from SQL and matches the Column API") {
    graft.functions.GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_hilbert(5L, 3L, 4) AS h").head().getLong(0)
    val viaCol = spark.range(1).select(
      graft.expressions.HilbertIndex(
        org.apache.spark.sql.functions.lit(5L),
        org.apache.spark.sql.functions.lit(3L), 4).as("h")).head().getLong(0)
    assert(got === viaCol)
  }
}

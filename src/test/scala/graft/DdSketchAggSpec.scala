package graft

import graft.functions.DdSketchAgg
import org.apache.spark.sql.functions._

/** The DDSketch aggregator must be partition-order invariant (bucket
  * counts add) and honor its α relative-error guarantee against exact
  * rank quantiles.
  */
class DdSketchAggSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.5, 0.95, 0.99)

  test("estimates identical under any repartitioning") {
    val df = (1 to 20000).map(i => ((i % 9).toLong, (i * 37 % 9973) / 7.0 + 0.01))
      .toDF("g", "v")
    val runs = Seq(1, 5, 32).map { parts =>
      df.repartition(parts, col("v"))
        .groupBy("g").agg(DdSketchAgg.quantiles(col("v"), qs).as("e"))
        .orderBy("g").as[(Long, Seq[Double])].collect().toSeq
    }
    assert(runs.distinct.size === 1, s"estimate changed with partitioning")
  }

  test("relative error within alpha vs exact rank quantiles") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val alpha = 0.01
    val est = events.agg(DdSketchAgg.quantiles(col("value"), qs, alpha).as("e"))
      .as[Seq[Double]].head()
    val exact = {
      val vs = events.select("value").as[Double].collect().sorted
      qs.map(q => vs(math.max(0, math.ceil(q * vs.length).toInt - 1)))
    }
    qs.indices.foreach { i =>
      val rel = math.abs(est(i) - exact(i)) / exact(i)
      assert(rel <= alpha + 1e-9,
        s"q=${qs(i)}: est=${est(i)} exact=${exact(i)} rel=$rel > $alpha")
    }
  }

  test("zeros and empty groups degrade gracefully") {
    val withZeros = Seq(0.0, 0.0, 5.0, 5.0).toDF("v")
    val e = withZeros.agg(DdSketchAgg.quantiles(col("v"), Seq(0.25, 1.0)).as("e"))
      .as[Seq[Double]].head()
    assert(e.head === 0.0) // q=0.25 lands in the zero bucket
    assert(math.abs(e(1) - 5.0) / 5.0 <= 0.01)
  }
}

package graft

import graft.functions.HllAgg
import org.apache.spark.sql.functions._

/** The HLL aggregator must be partition-order INVARIANT (register max is
  * associative+commutative) and stay inside its theoretical error bound
  * against exact distinct counts.
  */
class HllAggSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is identical under any repartitioning (mergeable sketch)") {
    val df = (0 until 20000).map(i => (i % 7, (i * 2654435761L) % 4211))
      .toDF("g", "v")
    val estimates = Seq(1, 3, 32).map { parts =>
      df.repartition(parts, col("v"))
        .groupBy("g").agg(HllAgg.hllDistinct(col("v")).as("est"))
        .orderBy("g").as[(Int, Long)].collect().toSeq
    }
    assert(estimates.distinct.size === 1,
      s"estimate changed with partitioning: $estimates")
  }

  test("error bound vs exact distinct per group (p=12 => sigma ~1.6%)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val est = events.groupBy("event_type")
      .agg(HllAgg.hllDistinct(col("user_id")).as("est"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      val n = exact(k).toDouble
      assert(math.abs(e - n) / n <= 0.10, s"$k: est=$e exact=$n off by >10%")
    }
  }

  test("NULL inputs are excluded, matching count(DISTINCT) semantics") {
    val df = Seq(Some(1L), Some(2L), Some(3L), None, None)
      .toDF("v")
    val withNulls = df.agg(HllAgg.hllDistinct(col("v")).as("e")).as[Long].head()
    val withoutNulls = df.filter(col("v").isNotNull)
      .agg(HllAgg.hllDistinct(col("v")).as("e")).as[Long].head()
    assert(withNulls === withoutNulls)
    assert(withNulls === 3L) // tiny cardinality => linear counting is exact
  }

  test("large-cardinality accuracy past the linear-counting regime") {
    val n = 200000
    val df = (0 until n).map(_.toLong).toDF("v")
    val e = df.agg(HllAgg.hllDistinct(col("v")).as("e")).as[Long].head()
    // p=12: sigma = 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
    assert(math.abs(e - n).toDouble / n <= 0.065, s"est=$e for n=$n")
  }
}

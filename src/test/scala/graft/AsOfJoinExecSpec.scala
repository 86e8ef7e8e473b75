package graft

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom physical as-of operator must agree row-for-row with the
  * proven window formulation (which q37 hash-verifies against DuckDB's
  * native ASOF JOIN), and must actually plan through [[AsOfJoinExec]].
  */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def randomSides(seed: Long, nLeft: Int, nRight: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    // small key space forces multi-row runs; duplicate (key, ts) pairs on
    // the right exercise the tie-break; keys 9xx exist on one side only
    val l = (0 until nLeft).map { i =>
      (rnd.nextInt(12).toLong + (if (rnd.nextInt(20) == 0) 900 else 0),
        rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val r = (0 until nRight).map { i =>
      (rnd.nextInt(12).toLong + (if (rnd.nextInt(20) == 0) 990 else 0),
        rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(100).toLong)
    }.toDF("k", "t", "rid", "payload")
    (l, r)
  }

  private def collectSorted(df: DataFrame): Seq[(Long, Long, Long, Option[Long], Option[Long])] =
    df.select("k", "t", "lid", "asof_rid", "asof_payload").collect().map { row =>
      (row.getLong(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3)),
        if (row.isNullAt(4)) None else Some(row.getLong(4)))
    }.sortBy(t => (t._1, t._2, t._3)).toSeq

  test("AsOfJoinExec equals the window formulation on random data") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val (l, r) = randomSides(seed, nLeft = 400, nRight = 400)
      val expected = collectSorted(
        AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("rid", "payload")))
      val got = collectSorted(
        AsOfJoinPlan.asOfExec(l, r, Seq("k"), "t", "t", Seq("rid", "payload")))
      assert(got === expected, s"divergence at seed=$seed")
    }
  }

  test("plans through AsOfJoinExec with co-partitioned sorted children") {
    val (l, r) = randomSides(7L, 100, 100)
    val df = AsOfJoinPlan.asOfExec(l, r, Seq("k"), "t", "t", Seq("payload"))
    df.count() // executes the merge path end to end
    // AQE hides the plan behind AdaptiveSparkPlanExec (children = Nil), so
    // assert on the final explain output instead of collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("AsOfJoin"), s"AsOfJoinExec missing from plan:\n$plan")
    assert(plan.contains("Exchange") && plan.contains("Sort"),
      "expected co-partitioning exchanges + per-partition sorts")
  }

  test("self-join (same base plan both sides) resolves and matches") {
    val base = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 15L, 102L))
      .toDF("k", "t", "id")
    val got = AsOfJoinPlan.asOfExec(
      base, base.filter(col("id") =!= 101L), Seq("k"), "t", "t", Seq("id"))
      .select("k", "t", "id", "asof_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 10L, 100L, 100L), (1L, 20L, 101L, 100L), (2L, 15L, 102L, 102L)))
  }

  test("empty right side yields all-null payload") {
    val l = Seq((1L, 10L, 0L)).toDF("k", "t", "lid")
    val r = Seq.empty[(Long, Long, Long, Long)].toDF("k", "t", "rid", "payload")
    val rows = AsOfJoinPlan.asOfExec(l, r, Seq("k"), "t", "t", Seq("rid", "payload"))
      .collect()
    assert(rows.length === 1 && rows.head.isNullAt(3) && rows.head.isNullAt(4))
  }
}

package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketized range join must equal the naive θ-join on every bucket
  * width, including negative coordinates and bucket-boundary endpoints.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the cross-join filter reference") {
    val rnd = new scala.util.Random(19)
    val points = (0 until 300).map(i => (i.toLong, rnd.nextLong() % 500))
      .toDF("pid", "p")
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextLong() % 500
      (i.toLong, s, s + rnd.nextInt(120))
    }.toDF("iid", "lo", "hi")

    val expected = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq

    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === expected, s"divergence at bucketWidth=$w")
    }
  }

  test("boundary endpoints are inclusive on both ends") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "p")
    val intervals = Seq((100L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L))
  }
}

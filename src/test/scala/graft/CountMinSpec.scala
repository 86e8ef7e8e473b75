package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

/** Ground truths for the count-min sketch (q139). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def stream(words: (String, Int)*) =
    words.flatMap { case (w, k) => Seq.fill(k)(w) }.toDF("word")

  test("estimates never undercount and are exact without collisions") {
    // 3 distinct keys in a 4x1024 sketch: collisions (deterministic, fixed
    // hashes) would show as est > exact — this fixture has none, so the
    // estimates are exact.
    val occ = stream("alpha" -> 7, "beta" -> 3, "gamma" -> 12)
    val sk = CountMin.sketch(occ, "word")
    val probes = Seq("alpha", "beta", "gamma").toDF("word")
    val got = CountMin.estimate(sk, probes, "word")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 12L))
  }

  test("sketch of the union == cell-wise sum of the parts (mergeability)") {
    val a = stream("x" -> 5, "y" -> 2)
    val b = stream("x" -> 1, "z" -> 9)
    val whole = CountMin.sketch(a.union(b), "word")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = CountMin.sketch(a, "word").union(CountMin.sketch(b, "word"))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(whole === merged)
  }

  test("an unseen key probes to a (possibly zero) overcount, never negative") {
    val occ = stream("only" -> 4)
    val sk = CountMin.sketch(occ, "word")
    // an absent key hits cells that may carry other keys' counts; with one
    // key in 4x1024 cells, "ghost" almost surely probes empty cells — but
    // empty cells are ABSENT rows, so the estimate join yields no row or 0+
    val got = CountMin.estimate(sk, Seq("ghost").toDF("word"), "word").collect()
    assert(got.forall(_.getLong(1) >= 0))
  }

  test("narrow width forces collisions; estimates still dominate exact") {
    val occ = stream((1 to 50).map(i => s"w$i" -> i): _*)
    val sk = CountMin.sketch(occ, "word", depth = 4, width = 8)
    val probes = (1 to 50).map(i => s"w$i").toDF("word")
    val est = CountMin.estimate(sk, probes, "word", depth = 4, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { i =>
      assert(est(s"w$i") >= i, s"w$i: est ${est(s"w$i")} < exact $i")
    }
  }
}

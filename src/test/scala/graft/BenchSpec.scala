package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench harness must surface a crashing query as "err", never as a
  * near-zero elapsed time silently improving the best-of-N total.
  */
class BenchSpec extends SparkSpec {

  test("crashing query reports err + failed entry; good query reports a time") {
    val good: (String, (SparkSession, String) => DataFrame) =
      ("good_query", (s, _) => s.range(3).toDF())
    val bad: (String, (SparkSession, String) => DataFrame) =
      ("bad_query", (_, _) => throw new RuntimeException("deliberately broken"))
    val res = Bench.timeQueries(spark, "unused", Seq(good, bad), runs = 2)
    assert(res.toMap.apply("good_query").exists(_ > 0.0))
    assert(res.toMap.apply("bad_query").isEmpty)
    val json = Bench.toJson(res, "unused", 2)
    assert(json.contains("\"bad_query\":\"err\""))
    assert(json.contains("\"failed\":[\"bad_query\"]"))
    // the total must count only the successful query's time
    assert(!json.contains("-1"))
  }

  test("adaptive rerun: >20% disagreement triggers exactly one extra sample") {
    var noisyCalls = 0
    val noisy: (String, (SparkSession, String) => DataFrame) =
      ("noisy", (s, _) => {
        noisyCalls += 1
        if (noisyCalls == 2) Thread.sleep(400) // force >20% spread
        s.range(1).toDF()
      })
    var stableCalls = 0
    val stable: (String, (SparkSession, String) => DataFrame) =
      ("stable", (s, _) => {
        stableCalls += 1
        Thread.sleep(500) // sleep dominates → runs agree within 20%
        s.range(1).toDF()
      })
    val res = Bench.timeQueries(spark, "unused", Seq(noisy, stable), runs = 2).toMap
    assert(noisyCalls === 3 && res("noisy").isDefined)
    assert(stableCalls === 2 && res("stable").isDefined)
  }
}

package graft

import graft.functions.TopKAgg
import graft.operators.{AsOfJoin, NearDup}
import java.sql.Timestamp

/** As-of join semantics, bounded top-k aggregator, winnowing containment. */
class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks latest right row at-or-before each left row, null before any") {
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),  // after clicks at 9:00 and 9:30
      (101L, 1L, ts("2024-01-01 09:30:00")),  // exactly at a click -> matches it
      (102L, 1L, ts("2024-01-01 08:00:00")),  // before any click -> null
      (103L, 2L, ts("2024-01-01 12:00:00")))  // other user
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")),
      (11L, 1L, ts("2024-01-01 09:30:00")),
      (20L, 2L, ts("2024-01-01 11:59:00")))
      .toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("event_id"), "click_")
      .select("event_id", "click_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === Map(
      100L -> Some(11L), 101L -> Some(11L), 102L -> None, 103L -> Some(20L)))
  }

  test("asOf carries the whole matched row: newest row's nulls stay null") {
    val left = Seq((100L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(1L), Some(9L)),
      (1L, ts("2024-01-01 09:30:00"), Some(2L), None)) // newest: b legitimately null
      .toDF("user_id", "ts", "a", "b")
    val row = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("a", "b"))
      .select("asof_a", "asof_b").head()
    assert(row.getLong(0) === 2L)
    assert(row.isNullAt(1), "stale b=9 from the older row must not resurrect")
  }

  test("connectedComponents works with non-numeric ids") {
    val pairs = Seq(("d1", "d2"), ("d2", "d3"), ("x9", "x7")).toDF("doc_a", "doc_b")
    val got = graft.operators.Components.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "d1" -> "d1", "d2" -> "d1", "d3" -> "d1", "x9" -> "x7", "x7" -> "x7"))
  }

  test("TopKAgg keeps exactly k best per group across partitions") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i.toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(7)
    val topk = TopKAgg.topK(4)
    val got = df.groupBy("g").agg(topk($"score", $"id").as("top"))
      .select($"g", $"top").as[(String, Seq[(Double, Long)])]
      .collect().toMap
    assert(got.keySet === Set("g0", "g1", "g2"))
    // group g0 holds multiples of 3 ≤ 999 → top4 = 999, 996, 993, 990
    assert(got("g0").map(_._2) === Seq(999L, 996L, 993L, 990L))
    got.values.foreach { top =>
      assert(top.map(_._1) === top.map(_._1).sorted.reverse)
    }
  }

  test("winnowingPairs detects a copied paragraph inside different documents") {
    val para = "the seventeen lighthouse keepers assembled quietly beneath the ancient cedar tree while winter storms gathered offshore"
    val docs = Seq(
      (1L, s"completely unrelated opening about tax law and accounting. $para and then it diverges into cooking recipes"),
      (2L, s"$para but this document otherwise discusses astronomy, telescopes and the motion of distant galaxies at length"),
      (3L, "a third document sharing absolutely nothing with the others, focused on gardening, soil acidity and compost rotation schedules"))
      .toDF("doc_id", "text")
    val pairs = NearDup.winnowingPairs(docs, k = 8, w = 4, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("winnowing candidate recall vs exact containment (q35's sketch)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // TRUE all-pairs ground truth (feasible at 500 docs): a jaccard
    // prefilter would drop exactly the small-doc-inside-huge-doc pairs
    // winnowing exists to catch (containment high, whole-set jaccard ~0)
    val ids = docs.select(col("doc_id"))
    val allPairs = ids.select(col("doc_id").as("doc_a"))
      .crossJoin(ids.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    val exact = NearDup.verifyPairsContainment(docs, allPairs, 3)
      .filter(col("containment") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = NearDup.winnowingPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = cand.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"winnow recall vs containment>=0.5: $recall")
    info(s"winnow candidate recall vs exact containment: $recall")
  }
}

package graft

import graft.operators.{NearDup, SetSimJoin}
import org.apache.spark.sql.functions._

/** Prefix-filtering set-similarity join: exactness against the full
  * inverted-index baseline (the no-false-negatives lemma, empirically),
  * plus the blocked edit-distance verifier's contract.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fixtureDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3L, "completely different content about spark catalyst optimizer rules and codegen stages"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    .toDF("doc_id", "text")

  test("prefixJaccardJoin equals the full inverted-index join (pairs AND values)") {
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val exact = NearDup.ngramJaccardPairs(Tables.documents(spark, sf), 3, tau)
        .select("doc_a", "doc_b", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e12))).toSet
      val pf = SetSimJoin.prefixJaccardJoin(Tables.documents(spark, sf), 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(5) * 1e12))).toSet
      assert(pf === exact, s"prefix-filtered join diverged at tau=$tau")
    }
  }

  test("prefixJaccardJoin finds planted near-dups with exact set arithmetic") {
    val rows = SetSimJoin.prefixJaccardJoin(fixtureDocs, n = 3, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val exactDup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L).get
    assert(exactDup.getLong(2) === exactDup.getLong(4)) // n_a == n_common
    assert(exactDup.getDouble(5) === 1.0)
  }

  test("blockedEditDistancePairs pairs within blocks and respects the cap") {
    val docs = Seq(
      (1L, "shared-prefix-0123456789abcdef tail one"),
      (2L, "shared-prefix-0123456789abcdef tail twox"),
      (3L, "unrelated prefix entirely different text")).toDF("doc_id", "text")
    val rows = SetSimJoin.blockedEditDistancePairs(docs, blockPrefix = 30, maxBlock = 64)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // "one" -> "twox": 3 substitutions + 1 insert = 4 edits
    assert(rows.head.getLong(2) === 4L)
    // a block larger than maxBlock is dropped entirely, not truncated
    val hub = (1L to 5L).map(i => (i, s"same-same-same-same-same-same-x $i")).toDF("doc_id", "text")
    assert(SetSimJoin.blockedEditDistancePairs(hub, blockPrefix = 30, maxBlock = 4).count() === 0L)
    assert(SetSimJoin.blockedEditDistancePairs(hub, blockPrefix = 30, maxBlock = 5).count() === 10L)
  }
}

package graft

import graft.operators.{Sampling, Sharding}
import org.apache.spark.sql.functions._

/** Exact-N sampling and global rank binning: differential equality with
  * the naive single-node formulations, determinism, and the plan shapes
  * that let them scale (bounded TopKAgg partials; no single-partition
  * rank stage).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("sampleExactN == ORDER BY scramble LIMIT n; deterministic; subset of input") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val got = Sampling.sampleExactN(docs, "doc_id", n = 100, seed = 7L)
      .select("doc_id").as[Long].collect().sorted
    assert(got.length === 100)
    val naive = docs
      .withColumn("scr", Sharding.scramble(col("doc_id"), 7L))
      .orderBy("scr", "doc_id").limit(100)
      .select("doc_id").as[Long].collect().sorted
    assert(got === naive)
    val again = Sampling.sampleExactN(docs, "doc_id", n = 100, seed = 7L)
      .select("doc_id").as[Long].collect().sorted
    assert(got === again)
    // different seed -> different draw (overwhelmingly)
    val other = Sampling.sampleExactN(docs, "doc_id", n = 100, seed = 8L)
      .select("doc_id").as[Long].collect().sorted
    assert(got !== other)
  }

  test("sampleExactN caps at the corpus size without error") {
    val tiny = Seq(1L, 2L, 3L).toDF("doc_id")
    assert(Sampling.sampleExactN(tiny, "doc_id", n = 100, seed = 1L).count() === 3)
  }

  test("rankBins: bin sizes differ by at most 1, bins monotone in the order key") {
    val binned = Sampling.rankBins(
      Tables.documents(spark, sf).select("doc_id", "n_chars"),
      Seq("n_chars", "doc_id"), nBins = 10)
      .select("doc_id", "n_chars", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sizes = binned.groupBy(_._3).map(_._2.length)
    assert(sizes.size === 10 && sizes.max - sizes.min <= 1, s"bin sizes: $sizes")
    // ascending (n_chars, doc_id) never decreases the bin
    val sorted = binned.sortBy(r => (r._2, r._1)).map(_._3)
    assert(sorted.sameElements(sorted.sorted))
  }

  test("quantileNormalize: row-preserving, order-preserving within source, extremes map to global extremes") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    val out = Sampling.quantileNormalize(docs, "source", "n_chars", "doc_id")
      .select("doc_id", "source", "n_chars", "calibrated")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length === docs.count())
    val (gMin, gMax) = (out.map(_._3).min, out.map(_._3).max)
    out.groupBy(_._2).foreach { case (src, rows) =>
      // within a source, ascending (score, id) order is preserved by calibration
      val sorted = rows.sortBy(r => (r._3, r._1))
      val cal = sorted.map(_._4)
      assert(cal.sameElements(cal.sorted), s"$src: calibration broke order")
      // stratum extremes land on (near-)global extremes: rank 0 -> global rank 0
      assert(cal.head === gMin, s"$src: min not calibrated to global min")
      assert(cal.last === gMax, s"$src: max not calibrated to global max")
    }
  }

  test("rankBins rank window is per-__pid partitioned, not a global window") {
    val p = Sampling.rankBins(
      Tables.documents(spark, sf).select("doc_id", "n_chars"),
      Seq("n_chars", "doc_id"), nBins = 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Window"), "expected the per-partition running window")
    // the window's required exchange hashes on the pinned partition id —
    // the corpus is never collapsed onto one task for ranking. (A
    // SinglePartition exchange still exists for the single-ROW total
    // count, which is partials-to-one-row, not a corpus collapse.)
    assert(p.contains("hashpartitioning(__pid"),
      "rank window must partition by __pid:\n" + p.take(1200))
  }
}

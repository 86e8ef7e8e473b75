package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the round-7 curation/analytics additions: repetition
  * rules (q145), decontamination (q146), seasonal anomalies (q147),
  * Adamic–Adar link prediction (q148), basket rules (q149). The RFM query
  * (q150) rides [[graft.operators.Sampling.rankBins]], pinned in
  * SamplingSpec; its end-to-end grading is the DuckDB oracle.
  */
class CurationRulesSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("repetitionProfile flags the degenerate doc, not the diverse one") {
    // doc 1: "ab ab ab ..." — one bigram repeated, ttr 2/12
    // doc 2: 12 distinct tokens — ttr 1.0, every bigram unique
    val d = docs(
      (1L, "s", Array.fill(6)("a b").mkString(" ")),
      (2L, "s", ('a' to 'l').mkString(" ")))
    val out = graft.queries.TextQueries.repetitionProfile(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_flagged") === 1L)
    // doc 1 ttr = 2/12; doc 2 ttr = 1 → mean = (0.166666667 + 1) / 2
    assert(math.abs(r.getAs[Double]("mean_ttr") - 0.5833333335) < 1e-9)
  }

  test("repetitionProfile: top-bigram and dup-trigram fractions are exact") {
    // tokens: x y x y x  → bigrams (xy, yx, xy, yx): top 2/4
    //                      trigrams (xyx, yxy, xyx): dup (2-1)+(1-1)=1 of 3
    val d = docs((1L, "s", "x y x y x"))
    val r = graft.queries.TextQueries.repetitionProfile(d).collect().head
    assert(r.getAs[Double]("mean_top_bigram_frac") === 0.5)
    assert(math.abs(r.getAs[Double]("mean_dup_trigram_frac") - 1.0 / 3) < 1e-9)
  }

  test("contaminationReport finds planted 8-gram overlap and nothing else") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val d = docs(
      (0L, "s", shared + " trailing words here"),         // eval (0 % 11 == 0)
      (1L, "s", "prefix words " + shared),                // train, contaminated
      (2L, "s", ('a' to 'k').map(_.toString).mkString(" ")), // train, clean
      (3L, "t", "short doc"))                             // train, too short for any shingle
    val bySrc = graft.queries.DedupQueries.contaminationReport(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bySrc("s") === ((2L, 1L)))
    assert(bySrc("t") === ((1L, 0L)))
  }

  test("seasonalAnomalies z-scores a spike against the same-hour baseline") {
    import spark.implicits._
    // type "a", hour 3: counts 2, 2, 8 across three days → mean 4, sd sqrt(8)
    val ts = Seq(
      ("2024-01-01 03:00:00", 2), ("2024-01-02 03:00:00", 2), ("2024-01-03 03:00:00", 8))
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val ev = ts.toDF("tss").select(
      to_timestamp(col("tss")).as("ts"), lit("a").as("event_type"))
    val out = graft.queries.EventQueries.seasonalAnomalies(ev, topK = 5).collect()
    assert(out.length === 3)
    val top = out.head
    assert(top.getAs[Long]("n_events") === 8L)
    assert(math.abs(top.getAs[Double]("z") - (8.0 - 4.0) / math.sqrt(8.0)) < 1e-9)
    assert(top.getAs[Double]("baseline_mean") === 4.0)
  }

  test("adamicAdar on a path graph scores the endpoints via the center") {
    import spark.implicits._
    // path 1-2-3: only non-adjacent pair (1,3), shared neighbor 2, deg 2
    val und = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val out = graft.operators.LinkPrediction.adamicAdar(und).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 3L)))
    assert(r.getAs[Long]("common_neighbors") === 1L)
    assert(math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(2.0)) < 1e-12)
  }

  test("bm25TopDocs ranks the exact-match doc first and respects df discounting") {
    // doc 1 contains both query terms; doc 2 one; doc 3 none. Same lengths.
    val d = docs(
      (1L, "s", "alpha beta gamma delta"),
      (2L, "s", "alpha zeta eta theta"),
      (3L, "s", "iota kappa lambda mu"))
    val out = graft.queries.TextQueries.bm25TopDocs(d, Seq(1 -> "alpha beta"), k = 10)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    val Seq(r1, r2) = out.toSeq
    assert(r1.getAs[Int]("rank") === 1 && r2.getAs[Int]("rank") === 2)
    // closed form: dl = avgdl ⇒ denominator = tf + k1; tf = 1 everywhere
    def idf(df: Int) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def contrib(df: Int) =
      BigDecimal(idf(df) * 1.0 * 2.2 / (1.0 + 1.2))
        .setScale(15, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r1.getAs[Double]("score") - (contrib(2) + contrib(1))) < 1e-12)
    assert(math.abs(r2.getAs[Double]("score") - contrib(2)) < 1e-12)
  }

  test("meanShiftSplit finds the planted level shift") {
    import spark.implicits._
    // type "a": 5 events/day for days 1-10, 50/day for days 11-20
    val rows = (1 to 20).flatMap { d =>
      val n = if (d <= 10) 5 else 50
      Seq.fill(n)(f"2024-03-$d%02d 12:00:00")
    }
    val ev = rows.toDF("tss").select(
      to_timestamp(col("tss")).as("ts"), lit("a").as("event_type"))
    val r = graft.queries.EventQueries.meanShiftSplit(ev).collect().head
    assert(r.getAs[java.sql.Date]("split_day").toString === "2024-03-10")
    assert(r.getAs[Int]("days_before") === 10)
    assert(r.getAs[Double]("mean_before") === 5.0)
    assert(r.getAs[Double]("mean_after") === 50.0)
    assert(r.getAs[Double]("shift") === 45.0)
  }

  test("adamicAdar excludes adjacent pairs and sums multiple centers") {
    import spark.implicits._
    // K4 minus edge (1,4): pair (1,4) shares centers 2 and 3, each deg 3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val out = graft.operators.LinkPrediction.adamicAdar(und).collect()
    assert(out.length === 1) // every other pair is an edge
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 4L)))
    assert(r.getAs[Long]("common_neighbors") === 2L)
    assert(math.abs(r.getAs[Double]("aa_score") - 2.0 / math.log(3.0)) < 1e-9)
  }
  test("trigramSearch: non-contiguous trigrams are candidates but fail verification") {
    // doc 1 contains "abcdef" contiguously; doc 2 carries every trigram of
    // the pattern (abc bcd cde def via "abcde" + "bcdef") but never the
    // contiguous string; doc 3 shares no trigrams
    val d = docs(
      (1L, "s", "xx abcdef yy"),
      (2L, "s", "abcde zz bcdef"),
      (3L, "s", "totally unrelated"))
    val out = graft.queries.TextQueries.trigramSearch(d, Seq("abcdef")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_candidates") === 2L) // docs 1 and 2
    assert(r.getAs[Long]("n_matches") === 1L)    // only doc 1 verifies
    assert(r.getAs[Double]("index_precision") === 0.5)
  }
}

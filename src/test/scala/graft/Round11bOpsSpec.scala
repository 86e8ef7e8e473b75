package graft

/** Value-level pins for the round-11 second-wave operators (q275–q281):
  * the oracle gate proves Spark/DuckDB agreement, these prove the MATH
  * (recomputation from emitted columns, bounds, degenerate-case
  * contracts) on sf0.001.
  */
class Round11bOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Mann-Kendall: S is pair-bounded, z sign follows S, trend follows z") {
    val rows = Registry.byName("q275_mann_kendall").run(spark, sf)
      .select("n_days", "s_stat", "var_s", "z", "trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(0), r.getLong(1))
      val maxPairs = n * (n - 1) / 2
      assert(math.abs(s) <= maxPairs, s"S=$s exceeds pair bound $maxPairs")
      assert(r.getDouble(2) >= 0.0, "Var(S) must be nonnegative")
      if (!r.isNullAt(3)) {
        val z = r.getDouble(3)
        if (s > 0) assert(z >= 0.0) else if (s < 0) assert(z <= 0.0)
        val t = r.getString(4)
        if (z > 1.96) assert(t == "increasing")
        else if (z < -1.96) assert(t == "decreasing")
        else assert(t == "none")
      } else assert(r.getString(4) == "undefined")
    }
  }

  test("ANOVA: F recomputes from the emitted sums of squares") {
    val rows = Registry.byName("q276_anova_f").run(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (k, n) = (r.getLong(0), r.getLong(1))
    val (ssb, ssw) = (r.getDouble(2), r.getDouble(3))
    assert(k > 1 && n > k)
    assert(ssw > 0.0, "within-group SS must be positive on real data")
    assert(ssb > -1e-6, "between-group SS is nonnegative up to rounding")
    val f = r.getDouble(4)
    val expect = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    // f was computed pre-round from the unrounded SSs — the recompute from
    // the 6 dp-rounded SSs agrees to the rounding envelope, not bit-exact
    assert(math.abs(f - expect) < 1e-6, s"F=$f, recomputed $expect")
  }

  test("sign-Hamming recall: one row per query, hits bounded by k, recall = hits/10") {
    val rows = Registry.byName("q277_sign_hamming_recall").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (0L until 10L), "queries 0..9 in order")
    rows.foreach { case (_, hits, rec) =>
      assert(hits >= 0 && hits <= 10)
      assert(math.abs(rec - hits.toDouble / 10.0) < 1e-12)
    }
    // one bit per dimension keeps SOME fidelity: the census is useless if
    // every query scores zero (would mean the signature carries no signal)
    assert(rows.map(_._2).sum > 0, "bit signatures recalled nothing at all")
  }

  test("KMV setops: small-set rule is exact, estimates positive, error recomputes") {
    val rows = Registry.byName("q278_kmv_setops").run(spark, sf)
      .select("exact_union", "exact_jaccard", "est_union", "est_jaccard",
        "jaccard_abs_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactU = r.getLong(0)
      val estU = r.getDouble(2)
      val estJ = r.getDouble(3)
      assert(estU > 0.0)
      assert(estJ >= 0.0 && estJ <= 1.0)
      // merged sketch smaller than K ⇒ KMV degrades to the exact count
      // and the jaccard estimate is computed over the whole union
      if (exactU < 64) {
        assert(estU == exactU.toDouble,
          s"small-set rule violated: est $estU vs exact $exactU")
        assert(math.abs(estJ - r.getDouble(1)) < 1e-12,
          "under K the sketch jaccard IS the exact jaccard")
      }
      if (!r.isNullAt(1) && !r.isNullAt(4))
        assert(math.abs(r.getDouble(4) -
          BigDecimal(math.abs(estJ - r.getDouble(1)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("average precision recomputes serially from the score/label frame") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = docs.groupBy(_._1).map { case (src, rs) =>
      val ranked = rs.sortBy(r => (-r._3, r._2))
      var cum = 0L
      val precs = ranked.zipWithIndex.map { case (r, i) =>
        if (r._4 == "en") { cum += 1; cum.toDouble / (i + 1) } else 0.0
      }
      val nPos = ranked.count(_._4 == "en")
      src -> (if (nPos > 0) Some(BigDecimal(precs.sum / nPos)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) else None)
    }
    val got = Registry.byName("q279_average_precision").run(spark, sf)
      .select("source", "ap").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, w) =>
      (w, got(src)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$src: $a vs $b")
        case (a, b) => assert(a == b, s"$src: $a vs $b")
      }
    }
  }

  test("token-source MI: contributions are nonnegative KLs, emitted in rounded-MI order") {
    val rows = Registry.byName("q280_token_source_mi").run(spark, sf)
      .select("w", "mi_nats").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (w, mi) =>
      assert(mi >= -1e-9, s"per-token MI is p(w)·KL ≥ 0, got $mi for '$w'")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1),
          s"order violated: $a before $b")
      case _ => ()
    }
  }

  test("Ljung-Box: Q nonnegative, verdict follows the chi2 cut, lags bounded by 10") {
    val rows = Registry.byName("q282_ljung_box").run(spark, sf)
      .select("n_days", "lags_used", "q_stat", "verdict").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lags = r.getLong(1)
      assert(lags >= 0 && lags <= 10)
      if (r.isNullAt(2))
        assert(r.getString(3) == (if (lags < 10) "insufficient" else "undefined"))
      else {
        val q = r.getDouble(2)
        assert(q >= -1e-9, s"Q is a sum of squares, got $q")
        val v = r.getString(3)
        if (lags < 10) assert(v == "insufficient")
        else if (q > 18.307038053275146) assert(v == "autocorrelated")
        else assert(v == "white")
      }
    }
  }

  test("Ljung-Box degenerate types: one-day emits lags_used=0 insufficient; constant multi-day is undefined") {
    // the round-11 ADVICE edge: an inner pairs join silently DROPPED
    // types with no lag pairs at all; the left-from-moments join must
    // emit them with lags_used = 0 and verdict 'insufficient'. A
    // constant 12-day series has all 10 lags but den <= 0: 'undefined'.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import java.sql.Timestamp
    val day0 = Timestamp.valueOf("2024-03-01 12:00:00")
    def at(d: Int) = new Timestamp(day0.getTime + d * 86400000L)
    val oneDay = Seq(("solo", at(0), 1L), ("solo", at(0), 2L))
    val const = (0 until 12).map(d => ("flat", at(d), 100L + d))
    val events = (oneDay ++ const)
      .toDF("event_type", "ts", "user_id")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(1.0))
    val dir = TestUtil.stageEventsDir(spark, events)
    val out = Registry.byName("q282_ljung_box").run(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3), r.getString(4))).toMap
    assert(out.keySet == Set("solo", "flat"), s"one-day type dropped: ${out.keySet}")
    assert(out("solo") == ((1L, 0L, true, "insufficient")))
    assert(out("flat") == ((12L, 10L, true, "undefined")))
  }

  test("SoftDeDup: effective size bounded by raw count, equal when nothing clustered") {
    val rows = Registry.byName("q281_softdedup_weights").run(spark, sf)
      .select("n_docs", "n_clustered", "eff_size", "keep_ratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, nc, eff, ratio) =>
      assert(nc >= 0 && nc <= n)
      assert(eff > 0.0 && eff <= n.toDouble + 1e-9)
      if (nc == 0) assert(math.abs(eff - n.toDouble) < 1e-9,
        "no clustered docs ⇒ every weight is 1")
      assert(math.abs(ratio - BigDecimal(eff / n)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}

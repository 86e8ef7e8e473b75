package graft

import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Value-level pins for the round-11 operators — the oracle gate proves
  * Spark/DuckDB agreement, these prove the MATH and the conventions
  * (direction, zero-division, monotonicity) on inputs small enough to
  * check by hand.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("containment is DIRECTED: short-inside-long fires only from the short side") {
    // doc 1 (6 tokens → two 5-gram shingles) is a verbatim prefix of
    // doc 2 (10 tokens → six shingles): C(1→2) = 2/2 = 1.0 but
    // C(2→1) = 2/6 < 0.6. doc 3 is an exact clone of doc 1 (the
    // canonicalization path): both directions inside the clone group are
    // 1.0 and the group's containment INTO doc 2 expands to both members.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    val got = NearDup.ngramContainmentPairs(docs, n = 5, threshold = 0.6)
      .select("doc_a", "doc_b", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, 2L, 1.0), (3L, 2L, 1.0),
      (1L, 3L, 1.0), (3L, 1L, 1.0)), s"got $got")
  }

  test("Kaplan-Meier: survival is a monotone step function over a consistent risk ledger") {
    val rows = Registry.byName("q268_kaplan_meier").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // the at-risk ledger: n_risk(t) = n_risk(prev) - d(prev) - c(prev)
    rows.sliding(2).foreach {
      case Array(p, c) => assert(c._2 == p._2 - p._3 - p._4, s"risk ledger broken at $c")
      case _ => ()
    }
    // survival starts ≤ 1, never increases, stays in [0, 1]
    assert(rows.head._5 <= 1.0 + 1e-12)
    rows.sliding(2).foreach {
      case Array(p, c) => assert(c._5 <= p._5 + 1e-12, s"survival increased at $c")
      case _ => ()
    }
    rows.foreach(r => assert(r._5 >= 0.0 && r._5 <= 1.0))
    // total subjects = first n_risk = all events + censorings
    assert(rows.map(r => r._3 + r._4).sum == rows.head._2)
  }

  test("Good-Turing: r* satisfies r*·N_r = (r+1)·N_{r+1} on the emitted grid") {
    val rows = Registry.byName("q270_good_turing").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.map(_._1).toSeq == (0L to 5L), "one row per count class 0..5")
    rows.filter(r => r._1 > 0 && r._2 > 0).foreach { case (r, nr, nx, st) =>
      val expect = (r + 1).toDouble * nx / nr
      assert(st.isDefined && math.abs(st.get - expect) < 1e-9,
        s"r*($r) = $st, want $expect")
    }
    val r0 = rows.find(_._1 == 0L).get
    assert(r0._4.isEmpty, "r = 0 has no adjusted count")
  }

  test("Cohen's kappa: kappa recomputes from the emitted po/pe and is bounded by 1") {
    val rows = Registry.byName("q269_cohens_kappa").run(spark, sf)
      .select("po", "pe", "kappa").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (po, pe) = (r.getDouble(0), r.getDouble(1))
      if (!r.isNullAt(2)) {
        val k = r.getDouble(2)
        assert(math.abs(k - BigDecimal((po - pe) / (1.0 - pe))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
        assert(k <= 1.0 + 1e-12)
      } else assert(pe >= 1.0, "kappa may only be NULL for the pe = 1 degenerate")
    }
  }

  test("langid eval: macro row averages the per-class F1s; zero-division classes score 0") {
    val rows = Registry.byName("q274_langid_eval").run(spark, sf)
      .select("cls", "precision", "recall", "f1").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val (macros, classes) = rows.partition(_._1 == "__macro__")
    assert(macros.length == 1 && classes.nonEmpty)
    def mean12(xs: Seq[Double]): Double =
      BigDecimal(xs.map(BigDecimal(_)).sum.toDouble / xs.length)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(macros.head._4 - mean12(classes.map(_._4).toSeq)) < 1e-12)
    classes.foreach { c =>
      assert(c._2 >= 0 && c._2 <= 1 && c._3 >= 0 && c._3 <= 1 && c._4 >= 0 && c._4 <= 1)
    }
  }

  test("Markov entropy: visit shares sum to 1, contributions recompute, H bounded by log2(fanout)") {
    val rows = Registry.byName("q272_markov_entropy").run(spark, sf)
      .select("visit_share", "h_bits", "rate_contribution").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9, "visit shares must partition 1")
    rows.foreach { case (w, h, rc) =>
      assert(h >= 0.0)
      assert(math.abs(rc - BigDecimal(w * h)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("overdispersion: fano recomputes from the emitted moments; nb_size only when var > mean") {
    val rows = Registry.byName("q271_overdispersion").run(spark, sf)
      .select("mean_daily", "var_daily", "fano", "nb_size").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, v, f) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(f - BigDecimal(v / m)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      if (v <= m) assert(r.isNullAt(3), "nb_size must be NULL at or under Poisson")
      else assert(!r.isNullAt(3) && r.getDouble(3) > 0.0)
    }
  }
}

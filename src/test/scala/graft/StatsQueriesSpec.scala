package graft

import graft.queries.StatsQueries
import java.sql.Timestamp

/** Closed-form ground truths for the statistical-profiling family (q131
  * correlation matrix, q132 χ² association, q133 histograms, q134 session
  * paths).
  */
class StatsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("corrMatrix: perfect positive / negative / zero correlation") {
    // y = 2x (r = 1), z = -x (r = -1 with x, -1 with y); every x level
    // appears once with w = +1 and once with w = -1, so Σw = Σwx = 0 and
    // corr(w, ·) = 0 exactly.
    val df = (1 to 4).flatMap { i =>
      Seq(1.0, -1.0).map(wv => (i.toDouble, 2.0 * i, -i.toDouble, wv))
    }.toDF("x", "y", "z", "w")
    val got = StatsQueries.corrMatrix(df, Seq("w", "x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("x", "y")) === 1.0)
    assert(got(("x", "z")) === -1.0)
    assert(got(("y", "z")) === -1.0)
    assert(math.abs(got(("w", "x"))) < 1e-6)
    assert(got.size === 6)
  }

  test("corrMatrix: one job, one row scan (single aggregate)") {
    val df = (1 to 100).map(i => (i.toDouble, (i * i).toDouble)).toDF("a", "b")
    val plan = StatsQueries.corrMatrix(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // the pair unfold must ride the single aggregate: no join, no union
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("chiSqTokens: the planted discriminative token wins its source") {
    // src A docs all contain "alpha", never "beta"; src B the reverse;
    // "common" appears everywhere (chi2 = 0 ⇒ ranks below the plants).
    val docs = ((1 to 12).map(i => (i.toLong, "A", "alpha common filler" + i)) ++
      (13 to 24).map(i => (i.toLong, "B", "beta common filler" + i)))
      .toDF("doc_id", "source", "text")
      .select($"doc_id", $"source", $"text")
    val got = StatsQueries.chiSqTokens(docs, minDf = 5, topK = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got(("A", 1)) === "alpha")
    assert(got(("B", 1)) === "beta")
  }

  test("chiSqTokens: df gate prunes rare tokens before the join") {
    val docs = Seq((1L, "A", "rare common"), (2L, "A", "common"), (3L, "B", "common"))
      .toDF("doc_id", "source", "text")
    val got = StatsQueries.chiSqTokens(docs, minDf = 3, topK = 5)
      .collect().map(_.getString(2)).toSet
    assert(got === Set("common"))
  }

  test("histogram: exact bin boundaries, top bin closed") {
    // values 0..20 over one type: lo=0, hi=20, w=1 ⇒ value v lands in bin
    // min(v, 19); bin 19 holds 19 and 20.
    val events = (0 to 20).map(v => ("t", v.toDouble)).toDF("event_type", "value")
    val got = StatsQueries.histogram(events, nBins = 20)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(got(0L) === 1L)
    assert(got(19L) === 2L)
    assert(got.values.sum === 21L)
    assert(got.keys.max === 19L)
  }

  test("histogram: global edges shared across types") {
    val events = (Seq(("a", 0.0), ("a", 10.0)) ++ Seq(("b", 5.0)))
      .toDF("event_type", "value")
    val rows = StatsQueries.histogram(events, nBins = 10).collect()
    // type b's single value 5.0 must land in the GLOBAL bin 5 (w = 1.0)
    val b = rows.filter(_.getString(0) == "b").head
    assert(b.getLong(1) === 5L)
    assert(b.getDouble(2) === 5.0 && b.getDouble(3) === 6.0)
  }

  test("sessionPaths: gap >= 30min splits; paths ordered and counted") {
    // u1: two sessions (view,cart | view); u2: one session (view,cart) ⇒
    // "view,cart" x2, "view" x1.
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 10L, ts("2024-01-01 10:10:00"), "cart"),
      (3L, 10L, ts("2024-01-01 11:00:00"), "view"), // 50min gap: new session
      (4L, 20L, ts("2024-01-01 09:00:00"), "view"),
      (5L, 20L, ts("2024-01-01 09:29:59"), "cart")) // 29:59 gap: same session
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = StatsQueries.sessionPaths(events, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("view,cart" -> 2L, "view" -> 1L))
  }

  test("sessionPaths: exactly 30min gap starts a new session (q27 contract)") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "b")) // == 30min: new session
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = StatsQueries.sessionPaths(events, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L))
  }

  test("psiDrift: identical halves score near zero, a level shift scores high") {
    // type "same": both halves uniform on {10,20,30}; type "shifted":
    // ref on {10,20,30}, cur concentrated at 90.
    def half(tpe: String, day: Int, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) =>
        (tpe, ts(f"2024-01-$day%02d 12:${i % 60}%02d:00"), v)
      }
    val rows =
      half("same", 1, Seq(10, 20, 30, 10, 20, 30)) ++
        half("same", 28, Seq(10, 20, 30, 10, 20, 30)) ++
        half("shifted", 1, Seq(10, 20, 30, 10, 20, 30)) ++
        half("shifted", 28, Seq(90, 90, 90, 90, 90, 90))
    val ev = rows.toDF("event_type", "ts", "value")
    val got = StatsQueries.psiDrift(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(math.abs(got("same")) < 0.05, s"same=${got("same")}")
    // hand value ≈ 0.49: bin9 (q−p)ln(q/p) ≈ 0.212, bins 0 and 5 ≈ 0.137 each
    assert(got("shifted") > 0.3, s"shifted=${got("shifted")}")
  }

  test("theilSenTrend: median slope shrugs off the outlier day OLS can't") {
    // daily counts 1,2,3,4,5 ... except day 2 spikes to 40 events: the
    // pairwise-slope median stays 1 (date: one event per unit of count)
    val rows = (0 to 5).flatMap { d =>
      val n = if (d == 2) 40 else d + 1
      (1 to n).map(k => ("a", ts(f"2024-02-${d + 1}%02d 0${k % 10}:0${k / 10 % 6}:00")))
    }
    val ev = rows.toDF("event_type", "ts")
    val r = StatsQueries.theilSenTrend(ev).collect().head
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Long]("n_pairs") === 15L)
    assert(r.getAs[Double]("theil_sen_slope") === 1.0)
  }

  test("ewmaDaily: hand-computed normalized half-life weights") {
    // counts 1, 3, 2 over three days; α = 1/2 truncated-normalized form:
    //   day0: 1
    //   day1: (3 + 1·2⁻¹) / (1 + 2⁻¹)        = 3.5 / 1.5
    //   day2: (2 + 3·2⁻¹ + 1·2⁻²) / 1.75     = 3.75 / 1.75
    val rows =
      (1 to 1).map(_ => ("a", ts("2024-03-01 10:00:00"))) ++
        (1 to 3).map(i => ("a", ts(s"2024-03-02 0$i:00:00"))) ++
        (1 to 2).map(i => ("a", ts(s"2024-03-03 0$i:00:00")))
    val got = StatsQueries.ewmaDaily(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getDate(1).toString -> r.getAs[Double]("ewma")).toMap
    assert(got("2024-03-01") === 1.0)
    assert(math.abs(got("2024-03-02") - 3.5 / 1.5) < 1e-9)
    assert(math.abs(got("2024-03-03") - 3.75 / 1.75) < 1e-9)
  }

  test("acfDaily: linear series is perfectly autocorrelated, alternation flips sign") {
    // type a: counts 1..10 (linear ⇒ acf = 1 at every lag);
    // type b: counts alternate 1,2,1,2,... ⇒ lag1 = −1, lag2 = +1
    val rows = (0 until 10).flatMap { d =>
      val date = f"2024-03-${d + 1}%02d"
      (1 to (d + 1)).map(k => ("a", ts(f"$date ${k % 24}%02d:00:00"))) ++
        (1 to (if (d % 2 == 0) 1 else 2)).map(k => ("b", ts(f"$date ${k % 24}%02d:30:00")))
    }
    val got = StatsQueries.acfDaily(rows.toDF("event_type", "ts"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getAs[Double]("acf"))))
      .toMap
    assert(got(("a", 1)) === ((9L, 1.0)))
    assert(got(("a", 3)) === ((7L, 1.0)))
    assert(got(("a", 7)) === ((3L, 1.0)))
    assert(got(("b", 1))._2 === -1.0)
    assert(got(("b", 2))._2 === 1.0)
  }
}

package graft

import graft.queries.EventQueries
import java.sql.Timestamp

/** Closed-form ground truths for the event-statistics additions (q110
  * retention cohorts, q111 per-group OLS trend).
  */
class EventStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retentionCohorts: hand-built two-cohort matrix") {
    // cohort A (week of Mon 2024-01-01): u1 active weeks 0,1,3; u2 week 0 only
    // cohort B (week of Mon 2024-01-08): u3 active weeks 0,1
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-24 10:00:00")),
      (2L, ts("2024-01-03 09:00:00")),
      (3L, ts("2024-01-08 08:00:00")), (3L, ts("2024-01-15 08:00:00")),
      (3L, ts("2024-01-16 18:00:00"))) // same week as prior row: still 1 user
      .toDF("user_id", "ts")
    val got = EventQueries.retentionCohorts(events)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-08", 0L) -> 1L,
      ("2024-01-08", 1L) -> 1L))
  }

  test("madOutliers: fence flags exactly the planted outlier") {
    // [1,2,3,4,5,100]: med 3.5, adevs [2.5,1.5,.5,.5,1.5,96.5], mad 1.5,
    // fence 4.5 ⇒ one outlier. A clean group flags none.
    val events = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("spiky", _)) ++
      Seq(10.0, 11.0, 12.0).map(("clean", _)))
      .toDF("event_type", "value")
    val got = EventQueries.madOutliers(events)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(4)))
      .toMap
    assert(got("spiky") === ((3.5, 1.5, 1L)), got.toString)
    assert(got("clean")._3 === 0L)
  }

  test("madOutliers: zero MAD makes any deviation an outlier") {
    // [0,0,0,0,100]: med 0, mad 0 ⇒ the 100 is the single outlier
    val events = Seq(0.0, 0.0, 0.0, 0.0, 100.0).map(("t", _)).toDF("event_type", "value")
    val got = EventQueries.madOutliers(events).collect().head
    assert(got.getLong(4) === 1L)
  }

  test("olsTrend: recovers an exact linear law per group") {
    // y = 2·days + 5  (slope_per_day = 2, intercept at 2024-01-01 = 5)
    // and a flat group y = 7 (slope 0, intercept 7)
    val lin = (0 until 50).map { d =>
      ("lin", ts(f"2024-01-${d % 28 + 1}%02d ${d % 24}%02d:00:00"), 0.0)
    }.map { case (g, t, _) =>
      val days = (t.getTime - ts("2024-01-01 00:00:00").getTime) / 86400000.0
      (g, t, 2.0 * days + 5.0)
    }
    val flat = (0 until 50).map(d =>
      ("flat", ts(f"2024-02-${d % 28 + 1}%02d 12:00:00"), 7.0))
    val got = EventQueries.olsTrend((lin ++ flat).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(got("lin")._1 - 2.0) < 1e-6, got.toString)
    assert(math.abs(got("lin")._2 - 5.0) < 1e-6, got.toString)
    assert(math.abs(got("flat")._1 - 0.0) < 1e-9, got.toString)
    assert(math.abs(got("flat")._2 - 7.0) < 1e-9, got.toString)
  }

  test("peakConcurrency: hand intervals, closed-endpoint convention") {
    // day 1: u1 09:00–11:00, u2 10:00–12:00, u3 11:00–13:00 — at 11:00 all
    // three overlap (u1 ends exactly when u3 starts; closed intervals both
    // count). day 2: u1 alone, single-event (zero-length) interval.
    val events = Seq(
      (1L, ts("2024-03-01 09:00:00")), (1L, ts("2024-03-01 11:00:00")),
      (2L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 12:00:00")),
      (3L, ts("2024-03-01 11:00:00")), (3L, ts("2024-03-01 13:00:00")),
      (1L, ts("2024-03-02 08:00:00")))
      .toDF("user_id", "ts")
    val got = EventQueries.peakConcurrency(events)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("2024-03-01" -> (3L, 3L), "2024-03-02" -> (1L, 1L)))
  }

  test("timeDecayAgg: weight 1 at the horizon, 1/2 at exactly one half-life") {
    val events = Seq(
      ("a", ts("2024-03-08 00:00:00"), 10.0),  // at t_max: weight 1
      ("a", ts("2024-03-01 00:00:00"), 10.0))  // 7 days old: weight 1/2
      .toDF("event_type", "ts", "value")
    val r = EventQueries.timeDecayAgg(events, halfLifeDays = 7.0).collect().head
    assert(r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-9)   // 1 + 0.5
    assert(math.abs(r.getDouble(3) - 15.0) < 1e-9)  // 10 + 5
  }
}

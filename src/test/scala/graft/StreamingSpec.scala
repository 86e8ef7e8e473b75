package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming/batch parity: each streaming operator run with
  * Trigger.AvailableNow must produce exactly the batch answer over the same
  * static data (Structured Streaming's core guarantee, and the property
  * that lets the engine swap batch ↔ streaming per deployment).
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling agg == batch tumbling agg") {
    val got = StreamOps.runAvailableNow(
      spark, StreamOps.tumblingAgg(StreamOps.eventsStream(spark, sf)), "s_tumbling")
      .orderBy("ws", "event_type")
    val want = Registry.byName("q25_window_tumbling_agg").run(spark, sf)
      .select("ws", "event_type", "n_events", "sum_value")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("streaming session windows == batch session windows") {
    val got = StreamOps.runAvailableNow(
      spark, StreamOps.sessionAgg(StreamOps.eventsStream(spark, sf)), "s_sessions")
      .orderBy("user_id", "session_start")
    val want = Registry.byName("q27_session_window").run(spark, sf)
      .select("session_start", "session_end", "user_id", "n_events", "sum_value")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("stream-stream interval join == batch interval join") {
    import org.apache.spark.sql.functions._
    val src = StreamOps.eventsStream(spark, sf)
    val got = StreamOps.runAvailableNow(
      spark,
      StreamOps.clickPurchaseJoin(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "click")),
      "s_ssjoin", org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("purchase_id", "click_id")
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts")
      .orderBy("purchase_id", "click_id")
    assert(got.collect().toSeq === want.collect().toSeq)
    assert(want.count() > 0, "expected at least one click-purchase pair in fixture data")
  }

  test("dedupStream drops re-delivered keys within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-streamdedup").toString
    // same event_id delivered twice (plus a distinct one), minutes apart
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 5.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 7.0))
      .toDF("event_id", "ts", "value")
      .write.parquet(s"$root/src")
    val schema = spark.read.parquet(s"$root/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$root/src")
    val got = StreamOps.runAvailableNow(
      spark, StreamOps.dedupStream(stream, Seq("event_id"), "1 hour"),
      "s_dedup", org.apache.spark.sql.streaming.OutputMode.Append())
    assert(got.select("event_id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("mapGroupsWithState running totals == batch groupBy at end of stream") {
    val got = StreamOps.runAvailableNow(
      spark,
      StreamOps.userRunningTotals(spark, StreamOps.eventsStream(spark, sf)).toDF(),
      "s_user_totals", OutputMode.Update())
    // Update mode emits one row per key per batch; the last emit per user
    // carries the final totals.
    val lastPerUser = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(
      lastPerUser.orderBy("user_id").collect().toSeq ===
        want.orderBy("user_id").collect().toSeq)
  }
}

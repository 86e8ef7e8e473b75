package graft

import org.apache.spark.sql.functions._

/** Same-session streaming scale probe (round-12 verdict item 1): time all
  * 9 streaming registry queries at ×10 and ×100 in ONE session — cold,
  * declared — so the scale curve comes from a single host state instead
  * of stitched eras, and decompose q101 (the one number that read
  * super-linear at ×100: 327 s vs q97's 60 s for the same session
  * aggregation) into its actual phases:
  *
  *   A. maxTs scan       — the batch agg that stamps the drain sentinel
  *   B. staging write    — landing the events as ordered micro-batch files
  *   C. streaming drain  — the watermarked session agg + sentinel flush
  *
  * A and B are DRAIN HARNESS costs (a production deployment drains a live
  * topic: no re-staging, no sentinel-stamp scan); C is the cost the
  * streaming engine itself pays. Separating them decides whether the fix
  * belongs in the harness (parallel staging) or the plan (state
  * partitioning).
  *
  * Usage: runMain graft.ProbeStreamScale [sfDir ...]
  */
object ProbeStreamScale {

  private val StreamingQueries = Seq(
    "q46_stream_interval_join", "q56_stream_dedup",
    "q80_streaming_cdc_snapshot", "q81_stream_running_totals",
    "q88_stream_static_enrich", "q97_stream_session_window",
    "q101_stream_session_append", "q183_stream_left_outer_join",
    "q237_stream_gap_anomalies")

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sfx10", "/tmp/graft_sfx100")
    val spark = GraftSession.build("graft-probe-stream-scale", defaultCpus = "32")
    try {
      dirs.foreach { dir =>
        val times = StreamingQueries.map { name =>
          val t0 = System.nanoTime()
          val n = Registry.byName(name).run(spark, dir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[stream-scale] $dir $name $secs%.1f s ($n rows)")
          name -> secs
        }
        println(s"""{"metric":"stream_scale","sf":"$dir","queries":{${
          times.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")}}}""")

        // q101 phase decomposition on this dir
        val events = Tables.events(spark, dir)
          .select(col("user_id").cast("long").as("user_id"),
            col("ts").cast("timestamp").as("ts"),
            col("value").cast("double").as("value"))
        val tA0 = System.nanoTime()
        val row = events.agg(max(col("ts")), count(lit(1))).head()
        val (maxTs, nEvents) = (row.getTimestamp(0), row.getLong(1))
        val tA = (System.nanoTime() - tA0) / 1e9
        val scratch = queries.Scratch.tempDir("graft_probe_stage_")
        val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 100 * 60 * 1000L)
        val tB0 = System.nanoTime()
        // sentinel folded into the data batch — mirrors sessionAggAppend
        val (staged, dataParts) = streaming.StreamOps.stageOrderedParts(
          scratch, Seq(
            (events.unionByName(events.sparkSession.createDataFrame(
              java.util.List.of(
                org.apache.spark.sql.Row(Long.MinValue, sentinelTs, 0.0)),
              events.schema)),
              "000_data", streaming.StreamOps.stagingParts(nEvents))))
        val tB = (System.nanoTime() - tB0) / 1e9
        val tC0 = System.nanoTime()
        val out = streaming.StreamOps.runAvailableNow(
          spark,
          s2 => streaming.StreamOps.sessionAgg(s2.readStream
            .schema(events.schema)
            .option("maxFilesPerTrigger", dataParts.toString)
            .parquet(staged)),
          "probe_append_sessions",
          org.apache.spark.sql.streaming.OutputMode.Append(),
          statePartitions = streaming.StreamOps.statePartitionsFor(nEvents))
          .filter(col("user_id") =!= Long.MinValue)
        val nSessions = out.count()
        val tC = (System.nanoTime() - tC0) / 1e9
        println(f"""{"metric":"q101_phases","sf":"$dir","n_events":$nEvents,""" +
          f""""n_sessions":$nSessions,"data_parts":$dataParts,""" +
          f""""state_partitions":${streaming.StreamOps.statePartitionsFor(nEvents)},""" +
          f""""maxts_scan_sec":$tA%.1f,"staging_write_sec":$tB%.1f,""" +
          f""""drain_sec":$tC%.1f}""")
      }
    } finally spark.stop()
  }
}

package graft

/** Shared test helpers. */
object TestUtil {
  /** Lowercase-hex MD5 of a UTF-8 string — matches Spark's and DuckDB's
    * `md5()`, used to check reconstructed-text contracts.
    */
  def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Stage a synthetic events frame as `<tmpdir>/events.parquet` in the
    * [[Tables.EventsSchemaMicros]] layout (missing columns defaulted), so
    * registry queries that read `Tables.events(spark, dir)` can run over
    * fixture rows instead of the driver corpus. Returns the sfDir.
    */
  def stageEventsDir(spark: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_fixture_")
    dir.toFile.deleteOnExit()
    val defaults = Map(
      "event_id" -> lit(0L), "user_id" -> lit(0L),
      "event_type" -> lit("e"), "value" -> lit(0.0), "props" -> lit("{}"))
    val full = defaults.foldLeft(events) { case (df, (c, d)) =>
      if (df.columns.contains(c)) df else df.withColumn(c, d)
    }
    full.selectExpr("CAST(event_id AS BIGINT) event_id",
        "CAST(ts AS TIMESTAMP) ts", "CAST(user_id AS BIGINT) user_id",
        "CAST(event_type AS STRING) event_type", "CAST(value AS DOUBLE) value",
        "CAST(props AS STRING) props")
      .coalesce(1)
      .write.option("outputTimestampType", "TIMESTAMP_MICROS")
      .mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }
}

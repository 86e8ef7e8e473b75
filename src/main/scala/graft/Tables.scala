package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness parquet tables (see TESTDATA.md).
  *
  * All engine queries receive a scale-factor directory and read only from
  * it; schemas are fixed by the driver's generator so we do not re-infer
  * or re-declare them here (parquet carries them).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** Shared by the batch reader and StreamOps.eventsStream so the two
    * paths can never disagree on the events shape.
    */
  val EventsRawSchema =
    "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
  val NanosAsLongOption = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and truncate to microseconds (values
    * are µs-aligned in the generator, and DuckDB reads the column as µs too).
    *
    * The legacy nanos-as-long flag is passed as a per-read option (reader
    * options are merged into the scan's Hadoop conf) with an explicit schema
    * so footer inference never runs — the session conf is left untouched.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema(EventsRawSchema)
      .option(NanosAsLongOption, "true")
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}

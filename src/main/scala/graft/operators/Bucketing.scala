package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins: writing both sides
  * bucketed by the join key into the same number of buckets lets Spark
  * plan repeated equi-joins with NO Exchange on either side — the shuffle
  * is paid once at write time and amortized over every subsequent join.
  * This is the storage-level answer to "the same fact-dim join runs every
  * hour over 100 TB": partitioning survives the round trip through the
  * catalog, unlike `repartition` which dies with the job.
  *
  * `bucketBy` requires a catalog table (`saveAsTable`); plain
  * `write.parquet` silently drops bucketing metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table: `n` buckets on `keys`,
    * optionally bucket-sorted, stored at `path` (external) when given.
    */
  def writeBucketed(
      df: DataFrame, table: String, n: Int, keys: Seq[String],
      sortCols: Seq[String] = Nil, path: Option[String] = None): Unit = {
    var w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(n, keys.head, keys.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Join two bucketed tables on `keys` — shuffle-free when both were
    * bucketed on `keys` with equal bucket counts.
    */
  def colocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** True iff the physical plan of `df` contains a shuffle exchange
    * (string match so AQE-wrapped plans are covered too).
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout utilities: how tables should be WRITTEN so reads scale.
  *
  * - [[writePartitioned]]: hive-style directory partitioning on low-
  *   cardinality columns → equality/IN predicates prune whole directories
  *   before any I/O (`PartitionFilters` in the scan, vs `PushedFilters`
  *   which still opens files). The first lever for 100 TB time-series:
  *   partition by date, prune to the queried window.
  * - [[writeRangeSorted]]: range-repartition + in-file sort on a column →
  *   parquet row-group min/max statistics become selective, so point/range
  *   predicates skip row groups inside files (the poor man's Z-order; for
  *   one dominant filter column it is strictly better than Z-order).
  * - Bucketed layout for join locality lives in [[Bucketing]].
  */
object Layout {

  /** Write hive-partitioned parquet: one directory per distinct value
    * combination of `cols` (keep them low-cardinality).
    */
  def writePartitioned(df: DataFrame, dir: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)

  /** Write range-partitioned, per-file-sorted parquet so row-group stats
    * on `col` are tight and disjoint across files.
    */
  def writeRangeSorted(df: DataFrame, dir: String, col: String, files: Int): Unit =
    df.repartitionByRange(files, df(col))
      .sortWithinPartitions(col)
      .write.mode("overwrite").parquet(dir)

  /** True iff reading `dir` with `condition` prunes partitions at plan
    * time (some scan carries a non-empty partition-filter list — inspected
    * on the plan nodes, not the display string, which truncates).
    */
  def prunesPartitions(spark: SparkSession, dir: String, condition: String): Boolean = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = spark.read.parquet(dir).filter(condition).queryExecution.executedPlan
    plan.collect { case s: FileSourceScanExec => s }
      .exists(_.partitionFilters.exists(!_.references.isEmpty))
  }
}

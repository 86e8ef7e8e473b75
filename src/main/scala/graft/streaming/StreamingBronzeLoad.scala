package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming form of the reference's bronze load (L1 of SURVEY §2a:
  * insert-if-absent on primary key, audit-timestamped —
  * /root/reference/src/load/load.py:25-128): a file-source stream drained
  * per micro-batch through `foreachBatch`, where each batch anti-joins the
  * already-landed keys before appending. Re-delivery of the same key (at
  * -least-once sources, overlapping extraction windows) lands exactly one
  * row — the same idempotence the reference gets from its per-row
  * existence probe, minus the O(n) row-at-a-time loop.
  *
  * At scale the anti-join's "existing keys" read prunes to the key column
  * (parquet column projection); on a transactional table format this
  * becomes MERGE WHEN NOT MATCHED. Batch callers can use [[loadBatch]]
  * directly — same semantics, no stream.
  */
object StreamingBronzeLoad {

  /** Append only the rows of `batch` whose `keyCol` is not already in
    * `bronzeDir`, stamping the audit timestamp. Returns appended count.
    */
  def loadBatch(
      spark: SparkSession, batch: DataFrame, bronzeDir: String, keyCol: String): Long = {
    val fresh = batch.dropDuplicates(keyCol)
    // existence probe must work on any Hadoop filesystem (s3a/hdfs/...),
    // and an existing-but-empty dir must read as "nothing landed yet"
    val existing = scala.util.Try(spark.read.parquet(bronzeDir).select(keyCol)).toOption
    val toAppend = existing match {
      case Some(ex) =>
        // null-safe join: a null key must still count as "already present"
        fresh.join(ex.withColumnRenamed(keyCol, "__existing_key"),
          fresh(keyCol) <=> col("__existing_key"), "left_anti")
      case None => fresh
    }
    val stamped = toAppend.withColumn("date_retrieved", current_timestamp())
      .persist() // one execution for both the count and the write (and one
                 // consistent audit timestamp evaluation)
    try {
      val n = stamped.count()
      if (n > 0) stamped.write.mode("append").parquet(bronzeDir)
      n
    } finally stamped.unpersist()
  }

  /** Drain everything currently available from `srcDir` into `bronzeDir`
    * with insert-if-absent semantics, then stop (the reference's scheduled
    * -Lambda lifecycle as an AvailableNow stream).
    */
  def run(
      spark: SparkSession, srcDir: String, bronzeDir: String, keyCol: String,
      checkpointDir: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        loadBatch(batch.sparkSession, batch, bronzeDir, keyCol); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

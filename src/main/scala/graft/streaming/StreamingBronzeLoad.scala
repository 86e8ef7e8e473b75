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
    val toAppend =
      if (new java.io.File(bronzeDir).exists()) {
        val existing = spark.read.parquet(bronzeDir).select(keyCol)
        fresh.join(existing, Seq(keyCol), "left_anti")
      } else fresh
    val stamped = toAppend.withColumn("date_retrieved", current_timestamp())
    val n = stamped.count()
    if (n > 0) stamped.write.mode("append").parquet(bronzeDir)
    n
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

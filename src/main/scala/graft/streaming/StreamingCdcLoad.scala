package graft.streaming

import graft.operators.{Cdc, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC apply: a change stream (I/U/D rows) folded into a keyed
  * snapshot, one copy-on-write version per micro-batch.
  *
  * [[StreamingBronzeLoad]] is the reference's insert-only L1; this is the
  * general MERGE form. Each batch is compacted to its latest change per
  * key (ordered by `seqCol` — CDC feeds carry a log sequence number),
  * merged with [[Cdc.applyChanges]], and written to `v<batchId>` with a
  * marker-file pointer flip — the same two-phase publish a transactional
  * table format does natively. Re-delivered batches (foreachBatch replays
  * after failure) are detected by batch id and skipped, making the sink
  * effectively exactly-once on top of an at-least-once stream.
  */
object StreamingCdcLoad {

  private val Marker = "_LATEST"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, dir) of the current snapshot, if any batch has committed.
    * Tolerates a corrupt/empty marker (crash between create and write of a
    * non-atomic writer, or a torn concurrent read) by falling back to the
    * highest committed `v*` directory — the marker is a pointer cache, the
    * version directories are the source of truth.
    */
  def latest(spark: SparkSession, root: String): Option[(Long, String)] = {
    val f = fs(spark, root)
    val marker = new org.apache.hadoop.fs.Path(s"$root/$Marker")
    val fromMarker =
      if (!f.exists(marker)) None
      else {
        val in = f.open(marker)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        s.toLongOption
      }
    fromMarker.orElse(maxVersionDir(f, root)).map(v => (v, s"$root/v$v"))
  }

  /** Highest `v<n>` directory under `root` that holds a completed parquet
    * write (`_SUCCESS`), or None. Recovery path only — O(#versions) listing.
    */
  private def maxVersionDir(
      f: org.apache.hadoop.fs.FileSystem, root: String): Option[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!f.exists(rootPath)) None
    else f.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .flatMap(st => {
        val n = st.getPath.getName
        if (n.startsWith("v")) n.drop(1).toLongOption else None
      })
      .filter(v => f.exists(new org.apache.hadoop.fs.Path(s"$root/v$v/_SUCCESS")))
      .maxOption
  }

  /** Apply one change batch; returns true if applied, false if `batchId`
    * was already committed (replay after failure — skipped).
    */
  def applyBatch(spark: SparkSession, changes: DataFrame, root: String,
      keys: Seq[String], seqCol: String, opCol: String = "op",
      batchId: Long = 0L): Boolean = {
    val current = latest(spark, root)
    if (current.exists(_._1 >= batchId)) {
      // normal only for a genuine foreachBatch replay (same checkpoint).
      // A restart with a CLEARED checkpoint restarts batch ids at 0 and
      // would land here for every batch — surface it loudly, because the
      // snapshot would otherwise silently stop advancing. (The batch-id ↔
      // marker coupling is the exactly-once contract: keep the checkpoint
      // directory paired with the snapshot root.)
      System.err.println(
        s"[StreamingCdcLoad] skipping batch $batchId: snapshot $root already at " +
          s"version ${current.get._1} (replay, or a checkpoint/marker mismatch)")
      return false
    }
    val compacted = Dedup.firstWriterWins(
      changes, keys, Seq(col(seqCol).desc)).drop(seqCol)
    val snapshot = current match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None => compacted.drop(opCol).limit(0)
    }
    val next = Cdc.applyChanges(snapshot, compacted, keys, opCol)
    next.write.mode("overwrite").parquet(s"$root/v$batchId")
    // pointer flip: write-then-rename, so a reader never observes a
    // truncated/empty marker (create(overwrite=true) would truncate in
    // place before the new bytes land). FileContext.rename(OVERWRITE) is
    // a SINGLE atomic replace on HDFS and local FS — the previous
    // delete-then-rename left a window with no marker at all, dropping
    // every concurrent reader onto the O(#versions) listing. On object
    // stores (S3A) rename itself is copy+delete, so the flip is NOT
    // atomic there; [[latest]]'s max-v* fallback keeps readers correct —
    // just slower — through that window, and a transactional table format
    // is the real answer at that tier.
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/$Marker.tmp")
    val out = f.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    val marker = new org.apache.hadoop.fs.Path(s"$root/$Marker")
    org.apache.hadoop.fs.FileContext
      .getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(f.makeQualified(tmp), f.makeQualified(marker),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    true
  }

  /** Drain all available change files from `srcDir` into the snapshot at
    * `root`, one version per micro-batch, then stop.
    */
  def run(spark: SparkSession, srcDir: String, root: String, keys: Seq[String],
      seqCol: String, checkpointDir: String, filesPerBatch: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch.sparkSession, batch, root, keys, seqCol, batchId = id); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

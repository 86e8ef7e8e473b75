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
      else try {
        val in = f.open(marker)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        s.toLongOption
      } catch {
        // torn read, stale checksum sidecar, marker deleted between exists
        // and open — all the same case: the pointer cache is unreadable,
        // the version directories are the source of truth
        case scala.util.control.NonFatal(_) => None
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
    // place before the new bytes land). The replace must be a SINGLE
    // atomic op, and WHICH op that is depends on the filesystem:
    //  - local fs: POSIX rename(2) via Files.move(ATOMIC_MOVE) — Hadoop's
    //    FileContext.rename(OVERWRITE) is NOT atomic here (RawLocalFs
    //    inherits AbstractFileSystem's delete-then-rename default, which
    //    reopens the no-marker window);
    //  - HDFS: FileContext.rename(OVERWRITE), which HDFS implements as an
    //    atomic namespace operation;
    //  - object stores (S3A): rename is copy+delete — NOT atomic;
    //    [[latest]]'s max-v* fallback keeps readers correct (just slower)
    //    through that window, and a transactional table format is the
    //    real answer at that tier.
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/$Marker.tmp")
    val marker = new org.apache.hadoop.fs.Path(s"$root/$Marker")
    val scheme = f.getUri.getScheme
    if (scheme == null || scheme == "file") {
      // raw java.nio on the local branch throughout: going through
      // LocalFileSystem.create would spawn .crc sidecars that a raw
      // rename then leaves stale (checksum failure on the next read)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath),
        batchId.toString.getBytes("UTF-8"))
      // a FOREIGN checksummed writer may have left a marker sidecar;
      // drop it so post-flip reads are raw (readers between the delete
      // and the move still see the old marker — never none)
      f.delete(new org.apache.hadoop.fs.Path(s"$root/.$Marker.crc"), false)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(f.makeQualified(marker).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val out = f.create(tmp, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
        .rename(f.makeQualified(tmp), f.makeQualified(marker),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
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

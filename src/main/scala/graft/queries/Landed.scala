package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Scratch-space management for queries that materialize intermediate or
  * landed parquet under /tmp.
  *
  * Two distinct lifetimes:
  *
  *  - [[Landed]]: output the DuckDB ORACLE reads back (`read_parquet`) —
  *    must survive JVM exit (the driver's DuckDB compare runs after
  *    Verify finishes), so it is never auto-deleted; instead each run
  *    lands under a per-(process, scale-dir) directory so concurrent
  *    verify/bench JVMs — or runs at different scale dirs — can't clobber
  *    each other's files, and stale run directories are swept on the next
  *    JVM's first landing.
  *  - [[Scratch]]: purely intra-run temp dirs (staged inputs, snapshot
  *    roots, checkpoints) — deleted recursively at JVM exit, so repeated
  *    bench/verify runs don't leak disk.
  */
object Landed {

  /** One tag per JVM: concurrent processes land to disjoint directories. */
  private val runTag: String = java.lang.ProcessHandle.current().pid().toString

  private val recorded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val sweepOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9]+", "_")

  /** Landing path for `name` at scale dir `dir` — unique per (JVM, dir,
    * query) — recorded so [[oraclePath]] (read when Verify dumps
    * oracle_sql.json AFTER running the queries in the same JVM) references
    * exactly the files this run wrote.
    */
  def land(name: String, dir: String): String = {
    sweepStale()
    val p = s"/tmp/graft_landed/p${runTag}_${sanitize(dir)}/$name.parquet"
    recorded.put(name, p)
    p
  }

  /** The path the query actually landed at in this JVM. The fallback (query
    * never ran here — e.g. a subset Verify) is deterministic but points at
    * nothing; it is only ever embedded in oracle SQL the harness won't
    * execute, because local_verify/the driver compare only queries whose
    * output parquet exists in the dump dir.
    */
  def oraclePath(name: String): String =
    recorded.getOrDefault(name, s"/tmp/graft_landed/unrun/$name.parquet")

  /** Best-effort removal of landed dirs from runs older than 6 hours: keeps
    * the un-deletable-at-exit lifetime from accumulating across rounds
    * while staying far clear of any concurrently live run.
    */
  private def sweepStale(): Unit =
    if (sweepOnce.compareAndSet(false, true)) {
      val root = Paths.get("/tmp/graft_landed")
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      try if (Files.isDirectory(root)) {
        val children = Files.list(root)
        try children.forEach { p =>
          try if (Files.getLastModifiedTime(p).toMillis < cutoff)
            Scratch.deleteRecursively(p)
          catch { case _: Throwable => () }
        } finally children.close()
      } catch { case _: Throwable => () }
    }
}

/** Intra-run temp dirs, recursively deleted at JVM exit (best effort). */
object Scratch {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private val hookOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Like Files.createTempDirectory, but the directory (and everything the
    * query later writes under it) is removed when the JVM exits — repeated
    * bench invocations previously leaked a fresh medallion/staging/
    * checkpoint tree under /tmp per run. Deletion happens at exit, not
    * eagerly, because the returned DataFrames read these files lazily
    * until the harness forces the action.
    */
  def tempDir(prefix: String): String = {
    if (hookOnce.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach(p => try deleteRecursively(p) catch { case _: Throwable => () })
      }, "graft-scratch-cleanup"))
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private[queries] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively) finally children.close()
    }
    Files.deleteIfExists(p)
  }
}

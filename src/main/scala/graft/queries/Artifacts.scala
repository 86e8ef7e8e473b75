package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Cross-session cache for expensive DERIVED artifacts (the knn graph,
  * kmeans assignment, routed near-dup pairs, LSH knn graph, trade edges).
  *
  * The per-JVM `computeIfAbsent` + [[Scratch]] pattern stopped these
  * builds from running twice inside one session, but every NEW session
  * (Verify, then Bench, then a scale probe — the driver runs several per
  * round) rebuilt them from scratch: ~90% of q204's ×100 cost was the
  * shared 2M-vector knn-graph landing alone. Artifacts are pure functions
  * of their input parquet + builder knobs, so they are safe to reuse
  * across processes when keyed by:
  *
  *  - a caller-owned `version` tag naming the builder algorithm + knobs
  *    (bump it when the build changes semantics), and
  *  - a stat fingerprint of the input parquet (relative file names, sizes,
  *    mtimes — cheap, no data read): any regeneration of the inputs
  *    changes the key, so a stale artifact can never be served.
  *
  * Publication is crash/concurrency-safe without locks: build into a
  * per-pid staging dir, then ATOMIC_MOVE onto the content-keyed target.
  * A concurrent builder that loses the race discards its copy and reads
  * the winner's (both are byte-equivalent by determinism — every builder
  * routed here is seeded/exact). `_SUCCESS` inside the dir gates torn
  * reads the same way [[Landed]] gates oracle fixtures.
  *
  * Reuse requires builder DETERMINISM given (inputs, version): the knn
  * graph below the brute-force bound is the exact top-k, the LSH builders
  * hash-derive their hyperplanes, kmeans is seeded — all replayable, so a
  * cached artifact is indistinguishable from a rebuilt one.
  */
object Artifacts {

  private val Root = Paths.get("/tmp/graft_artifacts")

  /** Wall seconds spent BUILDING each artifact in this JVM (key = the
    * content-keyed dir name). Cache hits never enter; only actual builds.
    * Bench reads this after the run so the recorded totals expose what
    * the min-of-2 estimator hides: an artifact consumer's run 2 reads the
    * warm copy, so its reported time excludes the build cost that run 1
    * paid (round-12 verdict, "What's wrong" #1).
    */
  private[graft] val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Artifacts older than this are swept on first use per JVM — content
    * keys make reuse safe indefinitely; the bound only caps disk. */
  private val SweepAgeMs = 48L * 3600 * 1000

  private val sweepOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Stat fingerprint of input files/dirs: (relative name, size, mtime)
    * of every regular file, sorted, md5'd. Stat-only — never reads data.
    */
  def fingerprint(inputs: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    inputs.sorted.foreach { in =>
      val p = Paths.get(in)
      md.update(in.getBytes("UTF-8"))
      if (Files.isDirectory(p)) {
        val files = Files.list(p)
        try {
          val it = files.sorted().iterator()
          while (it.hasNext) {
            val f = it.next()
            if (Files.isRegularFile(f)) {
              md.update(s"${f.getFileName}:${Files.size(f)}:${
                Files.getLastModifiedTime(f).toMillis}".getBytes("UTF-8"))
            }
          }
        } finally files.close()
      } else if (Files.isRegularFile(p)) {
        md.update(s"${Files.size(p)}:${
          Files.getLastModifiedTime(p).toMillis}".getBytes("UTF-8"))
      } // absent input: name-only — the build itself will surface the error
    }
    hex(md.digest()).take(16)
  }

  /** Returns the path of artifact `name` for these `inputs`, building it
    * at most once ACROSS sessions. `build` writes the artifact (a parquet
    * dir with _SUCCESS) at the staging path it is given.
    */
  def cached(name: String, version: String, inputs: Seq[String])(
      build: String => Unit): String = {
    sweepStale()
    val fp = fingerprint(inputs)
    val target = Root.resolve(s"${name}__${version}__$fp")
    if (Files.exists(target.resolve("_SUCCESS"))) return target.toString
    val pid = java.lang.ProcessHandle.current().pid()
    val staging = Root.resolve(s"${name}__${version}__$fp.build.$pid")
    Files.createDirectories(Root)
    Scratch.deleteRecursively(staging) // a crashed earlier build of this pid
    val t0 = System.nanoTime()
    build(staging.toString)
    buildSecs.merge(target.getFileName.toString,
      (System.nanoTime() - t0) / 1e9, (a, b) => a + b)
    require(Files.exists(staging.resolve("_SUCCESS")),
      s"artifact builder for $name left no _SUCCESS at $staging")
    try Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Scratch.deleteRecursively(staging) // lost the race — winner is equivalent
      case _: java.nio.file.DirectoryNotEmptyException =>
        // Linux rename(2) reports a populated existing target this way, not
        // as FileAlreadyExists — observed when two sessions race the same
        // key. Same resolution: the winner's copy is byte-equivalent.
        Scratch.deleteRecursively(staging)
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // non-atomic /tmp: publish via plain move only if nobody beat us
        if (Files.exists(target.resolve("_SUCCESS"))) Scratch.deleteRecursively(staging)
        else Files.move(staging, target, StandardCopyOption.REPLACE_EXISTING)
    }
    target.toString
  }

  /** Cache a driver-side rectangular float tensor (IVF centroids, PQ
    * codebooks) as a flat binary file under the content-keyed dir — the
    * ANN "model" artifacts are a few KB, so they skip parquet entirely.
    */
  def cachedTensor3(name: String, version: String, inputs: Seq[String])(
      build: => Array[Array[Array[Float]]]): Array[Array[Array[Float]]] = {
    val dir = cached(name, version, inputs) { p =>
      val t = build
      Files.createDirectories(Paths.get(p))
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        Files.newOutputStream(Paths.get(p, "tensor.bin"))))
      try {
        out.writeInt(t.length)
        out.writeInt(t.headOption.map(_.length).getOrElse(0))
        out.writeInt(t.headOption.flatMap(_.headOption).map(_.length).getOrElse(0))
        t.foreach(_.foreach(_.foreach(out.writeFloat)))
      } finally out.close()
      Files.createFile(Paths.get(p, "_SUCCESS"))
    }
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(dir, "tensor.bin"))))
    try {
      val (d0, d1, d2) = (in.readInt(), in.readInt(), in.readInt())
      Array.fill(d0)(Array.fill(d1)(Array.fill(d2)(in.readFloat())))
    } finally in.close()
  }

  /** 2-D specialization of [[cachedTensor3]] (nlist × dim centroids). */
  def cachedTensor2(name: String, version: String, inputs: Seq[String])(
      build: => Array[Array[Float]]): Array[Array[Float]] =
    cachedTensor3(name, version, inputs)(Array(build)).head

  private def sweepStale(): Unit =
    if (sweepOnce.compareAndSet(false, true)) {
      val cutoff = System.currentTimeMillis() - SweepAgeMs
      try if (Files.isDirectory(Root)) {
        val children = Files.list(Root)
        try children.forEach { p =>
          try {
            val stale = Files.getLastModifiedTime(p).toMillis < cutoff
            // .build.<pid> staging of a DEAD process is junk at any age
            val n = p.getFileName.toString
            val deadStaging = n.contains(".build.") &&
              n.split("\\.build\\.").lift(1).flatMap(_.toLongOption)
                .exists(pid => java.lang.ProcessHandle.of(pid).isEmpty)
            if (stale || deadStaging) Scratch.deleteRecursively(p)
          } catch { case _: Throwable => () }
        } finally children.close()
      } catch { case _: Throwable => () }
    }
}

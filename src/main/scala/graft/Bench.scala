package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Best-of-`runs` wall time per query; `None` when any run threw — a
    * crashing query must never report a near-zero elapsed time that would
    * silently flatter the total.
    *
    * Adaptive rerun: when the base runs disagree by more than 20%, ONE
    * extra run is taken before the min — round-over-round comparisons have
    * repeatedly flagged phantom "regressions" that were transient host
    * contention landing on both base runs (see PLANS.md round-4 triage);
    * a third sample at a different instant collapses most of them.
    */
  def timeQueries(
      spark: SparkSession, sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      runs: Int): Seq[(String, Option[Double])] =
    queries.map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
            None
        }
      }
      val base = (0 until runs).map(_ => once())
      if (base.exists(_.isEmpty)) (name, None)
      else {
        val times = base.flatten
        if (runs > 1 && times.max > times.min * 1.2)
          // a throw on the rerun is still a flaky query — report err, not
          // the min of the runs that happened to survive
          (name, once().map(t => (times :+ t).min))
        else (name, Some(times.min))
      }
    }

  /** The driver-contract JSON line: failed queries carry "err" in `queries`
    * and are listed in `failed`; only successful times enter the total.
    */
  def toJson(results: Seq[(String, Option[Double])], sfDir: String, runs: Int): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.map(_.toString).getOrElse("\"err\"") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","runs_per_query":$runs,"estimator":"min","adaptive_rerun":"1 extra run when base runs disagree >20%"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs shouldn't land on
    // whichever query happens to run first
    try {
      Tables.lineitem(spark, sfDir).filter("l_quantity > 0").count()
      Tables.documents(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
      Tables.events(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // best-of-N per query (default 2): single runs swing ±20% under
    // shared-hardware noise; the minimum is the standard stable estimator
    // of a query's actual cost
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = timeQueries(spark, sfDir, SparkEntry.queries.toSeq.sortBy(_._1), runs)
    println(toJson(results, sfDir, runs))
    // the full line above is the driver contract, but its recorded copy has
    // been tail/head-truncated between rounds — also drop a tiny summary
    // file so the headline number always survives intact
    val total = results.flatMap(_._2).sum
    val failed = results.count(_._2.isEmpty)
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","query_count":${results.size},"failed_count":$failed,"sf":"$sfDir","runs_per_query":$runs,"estimator":"min","adaptive_rerun":"1 extra run when base runs disagree >20%"}"""
    // Files.write throws on any I/O failure (a PrintWriter only sets a
    // silent error flag — a truncated summary would defeat the point);
    // relative path = the sbt working dir, overridable for other layouts
    val summaryPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_TOTAL", "BENCH_total.json")
    // ... and the FULL per-query line to its own file: the stdout copy has
    // been tail-truncated by the harness two rounds running, losing the
    // first ~30 query timings
    val queriesPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "BENCH_queries.json")
    Seq(summaryPath -> summary, queriesPath -> toJson(results, sfDir, runs)).foreach {
      case (path, payload) =>
        try java.nio.file.Files.write(
          java.nio.file.Paths.get(path),
          (payload + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case t: Throwable =>
          System.err.println(s"[bench] could not write $path: $t")
        }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
object ProbeBvk {
  final case class J(id: Int, start: Long, var end: Long, desc: String, tasks: Int)
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("probe-bvk")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("")
        jobs.put(js.jobId, J(js.jobId, js.time, -1L, site, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId); if (j != null) j.end = je.time
      }
    })
    val ew = queries.GraphQueries.knnEdgesWForProbe(spark, dir)
    val canon = ew.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"))
      .groupBy("a", "b").agg(min(col("w")).as("w"))
    val mult = sys.env.getOrElse("PROBE_BVK_MULT", "1").toInt
    val scaled = if (mult <= 1) canon else
      (0 until mult).map(i => canon.select((col("a") + lit(i * 1000000000L)).as("a"),
        (col("b") + lit(i * 1000000000L)).as("b"), col("w"))).reduce(_.union(_))
    scaled.count()
    (1 to 2).foreach { i =>
      jobs.clear(); Thread.sleep(300)
      val t0 = System.nanoTime()
      val n = operators.Boruvka.forestCensus(scaled, 5, 4, driverEdgeThreshold = 0).count()
      Thread.sleep(400)
      println(f"[probe-bvk] run$i forced-distributed: ${(System.nanoTime()-t0)/1e6}%.0f ms, ${jobs.size} jobs, $n rows")
      if (false) {
        import scala.jdk.CollectionConverters._
        var prev = -1L
        jobs.values.asScala.toSeq.sortBy(_.start).foreach { j =>
          val gap = if (prev < 0) 0L else j.start - prev
          println(f"[probe-bvk]   job ${j.id}%3d ${math.max(0L, j.end - j.start)}%5d ms ${j.tasks}%4d tasks (+$gap%4d) ${j.desc.take(70)}")
          prev = math.max(prev, if (j.end < 0) j.start else j.end)
        }
      }
    }
    spark.stop()
  }
}

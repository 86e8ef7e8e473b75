package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for plan-quality review: filter/column pushdown
  * into parquet scans, join strategy choice, whole-stage-codegen coverage.
  * Run: sbt 'runMain graft.PlanAudit [queryName ...]'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Registry.all.map(_.name)
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(Registry.byName(n).run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

package graft.pipeline

import graft.schema.MonzoSchemas
import graft.sources.MonzoSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable example of the medallion pipeline surface: flatten → idempotent
  * bronze load (replayed twice) → silver → gold, printed to stdout.
  *
  * `sbt "runMain graft.pipeline.MedallionDemo [rootDir]"`
  */
object MedallionDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("medallion_demo").toString)
    val m = Medallion(root)

    val api = spark.read.schema(MonzoSchemas.apiTransaction).json(spark.createDataset(Seq(
      """{"id":"tx_a","amount":-1299,"currency":"GBP","created":"2025-06-05T12:00:00Z","merchant":{"id":"m1","name":"Cafe","suggested_tags":["coffee"]},"counterparty":{"name":"x","account_number":1,"sort_code":2}}""",
      """{"id":"tx_b","amount":-701,"currency":"GBP","created":"2025-06-20T09:00:00Z","merchant":{"id":"m1","name":"Cafe RENAMED"}}""",
      """{"id":"tx_c","amount":30000,"currency":"GBP","created":"2025-06-28T09:00:00Z"}""")))
    val bronze = MonzoSource.flattenTransactions(api)
    val balance = MonzoSource.shapeBalance(
      Seq((10L, 10L, "GBP", -5L)).toDF("balance", "total_balance", "currency", "spend_today"))
    val pots = MonzoSource.explodePots(
      spark.read.json(spark.createDataset(Seq("""{"pots":[{"id":"p1","balance":7}]}"""))))

    m.run(spark, bronze, balance, pots, lit("2025-07-01T00:00:00Z").cast("timestamp"))
    // Replay the identical batch: bronze/silver must not grow (L1 semantics).
    m.run(spark, bronze, balance, pots, lit("2025-07-02T00:00:00Z").cast("timestamp"))

    println(s"root=$root")
    println("GOLD monthly_spending:")
    spark.read.parquet(m.goldMonthly).orderBy("year", "month").show(truncate = false)
    println("SILVER merchants (first-writer-wins):")
    spark.read.parquet(m.silverMerchants).select("id", "name").show(truncate = false)
    println("counts: bronze_tx=" + spark.read.parquet(m.bronzeTx).count() +
      " silver_tx=" + spark.read.parquet(m.silverTx).count() +
      " balance_snapshots=" + spark.read.parquet(m.bronzeBalance).count() +
      " pots_snapshots=" + spark.read.parquet(m.bronzePots).count())
    spark.stop()
  }
}

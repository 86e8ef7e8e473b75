package graft.pipeline

import graft.operators.{Dedup, GoldAgg, Normalize}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze → silver → gold medallion orchestration over Parquet directories
  * (SURVEY.md §3; reference lifecycle /root/reference/src/main.py:19-85).
  *
  * Reference semantics reproduced:
  *  - L1 insert-if-absent keyed bronze load (load.py:25-128) → anti join of
  *    the incoming batch against existing bronze keys, append.
  *  - L2/L3 append-only snapshots (load.py:130-235) → plain appends.
  *  - L4 audit stamp (load.py:47,140,174) → injectable `clock` column so
  *    runs are reproducible in tests (SURVEY.md §7.4: nondeterministic
  *    current_timestamp would break differential comparison).
  *  - T1/T2 dimension extraction with first-writer-wins on PK conflicts
  *    (transform_bronze_to_silver.sql:1-35, INSERT OR IGNORE).
  *  - T3/T4 fact projection + INTEGER→REAL widening
  *    (transform_bronze_to_silver.sql:37-59, create_silver_layer.sql:4).
  *  - G1 gold monthly rollup (create_gold_layer.sql:1-6 — declared but never
  *    populated in the reference; we populate it).
  *
  * The reference's SQLite-file-through-S3 round trip (main.py:40-49,67-69)
  * disappears: each layer is a Parquet directory addressed directly (s3a://
  * in production). Its single end-of-run commit becomes an atomic Parquet
  * overwrite per table. At warehouse scale the same plans run unchanged over
  * a transactional table format; nothing here loops on the driver.
  */
final case class Medallion(root: String) {
  val bronzeTx = s"$root/bronze/transactions"
  val bronzeBalance = s"$root/bronze/balance"
  val bronzePots = s"$root/bronze/pots"
  val silverTx = s"$root/silver/transactions"
  val silverCounterparties = s"$root/silver/counterparties"
  val silverMerchants = s"$root/silver/merchants"
  val goldMonthly = s"$root/gold/monthly_spending"

  private def readOr(spark: SparkSession, path: String, like: DataFrame): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException => like.limit(0) }

  /** L1+L4 — idempotent keyed bronze load: append only ids not yet present,
    * stamped with `clock`. Loading the same batch twice is a no-op.
    */
  def loadBronzeTransactions(spark: SparkSession, incoming: DataFrame, clock: Column): Unit = {
    val stamped = incoming.withColumn("date_retrieved", clock)
    val existing = readOr(spark, bronzeTx, stamped)
    val fresh = Dedup.firstWriterWins(
      Dedup.insertIfAbsent(stamped, existing, Seq("id")),
      Seq("id"), Seq(col("created").asc_nulls_last, col("id").asc))
    fresh.write.mode(SaveMode.Append).parquet(bronzeTx)
  }

  /** L2/L3+L4 — unconditional snapshot append. */
  def appendSnapshot(df: DataFrame, path: String, clock: Column): Unit =
    df.withColumn("date_retrieved", clock).write.mode(SaveMode.Append).parquet(path)

  /** T1-T4 — bronze → silver. Deterministic first-writer order: earliest
    * `date_retrieved`, then `created`, then PK (SQLite's pick among
    * duplicates is scan order; we fix a total order, SURVEY.md §7.4).
    */
  def transformSilver(spark: SparkSession): Unit = {
    val bronze = spark.read.parquet(bronzeTx)
    val order = Seq(col("date_retrieved").asc, col("created").asc_nulls_last, col("id").asc)

    // T1 — counterparties dim, composite key (account_num, sort_code).
    val counterparties = Normalize.firstWriterDim(
        bronze,
        keyCols = Seq("counterparty_account_num", "counterparty_sort_code"),
        attrCols = Seq("counterparty_name"),
        order = order)
      .select(
        col("counterparty_account_num").as("account_num"),
        col("counterparty_sort_code").as("sort_code"),
        col("counterparty_name").as("name"))

    // T2 — merchants dim, key id, first-writer-wins on attribute conflicts.
    val merchantCols = bronze.columns.filter(_.startsWith("merchant_")).toSeq
    val merchants = Normalize.firstWriterDim(
        bronze,
        keyCols = Seq("merchant_id"),
        attrCols = merchantCols.filterNot(_ == "merchant_id"),
        order = order)
      .select(col("merchant_id").as("id") +:
        merchantCols.filterNot(_ == "merchant_id")
          .map(c => col(c).as(c.stripPrefix("merchant_"))): _*)

    // T3+T4 — fact projection: drop denormalized merchant/counterparty
    // attribute columns, keep FKs, widen amount to double, stamp inserted_at.
    val fact = Dedup.firstWriterWins(bronze, Seq("id"), order)
      .select(
        col("id"), col("description"),
        col("amount").cast("double").as("amount"),
        col("currency"), col("created"), col("category"), col("notes"),
        col("is_load"), col("settled"),
        col("local_amount"), col("local_currency"),
        col("counterparty_account_num"), col("counterparty_sort_code"),
        col("merchant_id"),
        // reference silver_transactions carries only inserted_at
        // (create_silver_layer.sql:1-19)
        col("date_retrieved").as("inserted_at"))

    counterparties.write.mode(SaveMode.Overwrite).parquet(silverCounterparties)
    merchants.write.mode(SaveMode.Overwrite).parquet(silverMerchants)
    fact.write.mode(SaveMode.Overwrite).parquet(silverTx)
  }

  /** G1 — gold monthly spending mart (spend = negative amounts, stored as
    * positive totals; reference leaves the populate unwritten, shape is
    * create_gold_layer.sql:1-6: month, year, total_spend, avg_spend).
    */
  def buildGold(spark: SparkSession): Unit = {
    val silver = spark.read.parquet(silverTx)
    GoldAgg.monthlySpend(
        silver.filter(col("amount") < 0).withColumn("spend", -col("amount")),
        dateCol = "created", amountCol = "spend",
        yearName = "year", monthName = "month")
      .drop("n_rows")
      .write.mode(SaveMode.Overwrite).parquet(goldMonthly)
  }

  /** Entry-point-1 shape (main.py:19-85): load → transform → gold. */
  def run(spark: SparkSession, transactions: DataFrame, balance: DataFrame,
      pots: DataFrame, clock: Column): Unit = {
    loadBronzeTransactions(spark, transactions, clock)
    appendSnapshot(balance, bronzeBalance, clock)
    appendSnapshot(pots, bronzePots, clock)
    transformSilver(spark)
    buildGold(spark)
  }
}

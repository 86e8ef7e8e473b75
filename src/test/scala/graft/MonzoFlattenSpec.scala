package graft

import graft.schema.MonzoSchemas
import graft.sources.MonzoSource
import org.apache.spark.sql.Row

/** P1-P3 flatten semantics vs the reference's _extract_merchant_info
  * (/root/reference/src/utils/api/api_client.py:32-109) on FIXTURES.md §A2
  * shaped payloads.
  */
class MonzoFlattenSpec extends SparkSpec {

  private val fullTx =
    """{"id":"tx_0001","description":"noodle bar","amount":-350,"currency":"GBP",
      |"created":"2025-01-01T00:00:00Z","category":"eating_out","notes":"",
      |"is_load":false,"settled":"2025-01-02T00:00:00Z",
      |"local_amount":-350,"local_currency":"GBP",
      |"counterparty":{"name":"Alex","account_number":12345678,"sort_code":123456},
      |"merchant":{"id":"merch_0001","name":"Noodles","category":"eating_out",
      |"logo":"https://l","emoji":"x","online":false,"atm":false,
      |"address":{"address":"1 High St","city":"London","postcode":"N1 1AA",
      |"country":"GBR","latitude":51.5,"longitude":-0.1},
      |"google_places_id":"gp1","suggested_tags":["food","lunch"],
      |"foursquare_id":"fs1","website":"https://w"}}""".stripMargin.replaceAll("\n", "")

  private val noMerchantTx =
    """{"id":"tx_0002","description":"transfer","amount":1000,"currency":"GBP",
      |"created":"2025-01-03T00:00:00Z","category":"general","notes":"",
      |"is_load":true,"local_amount":1000,"local_currency":"GBP",
      |"counterparty":{"name":"Sam","account_number":87654321,"sort_code":654321}}"""
      .stripMargin.replaceAll("\n", "")

  private val bareTx = """{"id":"tx_0003","currency":"GBP","created":"2025-01-04T00:00:00Z"}"""

  test("full transaction flattens to 31 columns with renames") {
    val out = MonzoSource.flattenTransactions(jsonDf(MonzoSchemas.apiTransaction, fullTx))
    assert(out.columns.length === 31)
    val r = out.collect()(0)
    assert(r.getAs[String]("id") === "tx_0001")
    assert(r.getAs[Long]("amount") === -350L)
    assert(r.getAs[Long]("counterparty_account_num") === 12345678L)
    assert(r.getAs[String]("merchant_city") === "London")
    assert(r.getAs[Double]("merchant_latitude") === 51.5)
    assert(r.getAs[String]("merchant_suggested_tags") === """["food","lunch"]""")
    assert(r.getAs[java.sql.Timestamp]("created").toInstant.toString === "2025-01-01T00:00:00Z")
  }

  test("missing merchant: attributes null, online/atm false (reference default)") {
    val out = MonzoSource.flattenTransactions(jsonDf(MonzoSchemas.apiTransaction, noMerchantTx))
    val r = out.collect()(0)
    val merchantCols = out.columns.filter(_.startsWith("merchant_"))
    assert(merchantCols.length === 17)
    // api_client.py:59-78 initializes online/atm = False for EVERY row,
    // before the merchant-presence check; the other 15 stay None
    val alwaysFalse = Set("merchant_online", "merchant_atm")
    merchantCols.filterNot(alwaysFalse).foreach(c =>
      assert(r.isNullAt(r.fieldIndex(c)), s"$c should be null"))
    alwaysFalse.foreach(c => assert(r.getAs[Boolean](c) === false, s"$c should be false"))
    assert(r.getAs[Boolean]("is_load") === true)
  }

  test("null-defaulting: missing amount→0, is_load→false; unsettled→null") {
    val out = MonzoSource.flattenTransactions(jsonDf(MonzoSchemas.apiTransaction, bareTx))
    val r = out.collect()(0)
    assert(r.getAs[Long]("amount") === 0L)
    assert(r.getAs[Long]("local_amount") === 0L)
    assert(r.getAs[Boolean]("is_load") === false)
    assert(r.isNullAt(r.fieldIndex("settled")))
    assert(r.isNullAt(r.fieldIndex("counterparty_name")))
  }

  test("flatten totality: every nullability pattern still yields 31 columns") {
    val rows = Seq(fullTx, noMerchantTx, bareTx)
    val out = MonzoSource.flattenTransactions(
      jsonDf(MonzoSchemas.apiTransaction, rows: _*))
    assert(out.columns.length === 31)
    assert(out.count() === 3)
  }

  test("balance shaping applies abs(spend_today)") {
    import spark.implicits._
    val bal = Seq((150000L, 155000L, "GBP", -2350L))
      .toDF("balance", "total_balance", "currency", "spend_today")
    val r = MonzoSource.shapeBalance(bal).collect()(0)
    assert(r.getAs[Long]("spend_today") === 2350L)
  }

  test("pots payload explodes to one row per pot") {
    import spark.implicits._
    val payload = spark.read.json(spark.createDataset(Seq(
      """{"pots":[{"id":"pot_1","balance":5000,"currency":"GBP"},
        |{"id":"pot_2","balance":100,"currency":"GBP"}]}""".stripMargin.replaceAll("\n", ""))))
    val out = MonzoSource.explodePots(payload)
    assert(out.count() === 2)
    assert(out.select("id").collect().map(_.getString(0)).sorted === Array("pot_1", "pot_2"))
  }
}

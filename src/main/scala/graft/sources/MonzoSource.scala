package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** API-shape → bronze-shape transforms (SURVEY.md §2a P1-P3, S2-S3).
  *
  * The reference flattens the nested `/transactions?expand[]=merchant`
  * payload to ~31 scalar columns driver-side in Python
  * (/root/reference/src/utils/api/api_client.py:32-109). Here the flatten is
  * a declarative projection over a struct-typed DataFrame, so it runs
  * distributed, survives whole-stage codegen, and Catalyst prunes unread
  * struct fields at the source.
  *
  * In production the upstream DataFrame comes from a driver-side HTTP fetch
  * (`spark.createDataFrame`) or `spark.read.schema(apiTransaction).json(...)`
  * over landed payload files; tests feed JSON fixtures (FIXTURES.md §A2).
  */
object MonzoSource {

  /** P1+P2+P3 — flatten nested transaction structs to the 31 bronze columns.
    *
    * Null-defaulting mirrors `.get(key, default)` (api_client.py:44-51):
    * amount/local_amount→0, is_load→false. A missing merchant leaves the 15
    * attribute columns NULL but merchant_online/merchant_atm FALSE — the
    * reference initializes those two to False for every row before the
    * merchant check (api_client.py:58-78). `suggested_tags` is
    * JSON-serialized like json.dumps at load time (load.py:117).
    */
  def flattenTransactions(api: DataFrame): DataFrame =
    api.select(
      col("id"),
      col("description"),
      coalesce(col("amount"), lit(0L)).as("amount"),
      col("currency"),
      to_timestamp(col("created")).as("created"),
      col("category"),
      col("notes"),
      coalesce(col("is_load"), lit(false)).as("is_load"),
      to_timestamp(col("settled")).as("settled"),
      coalesce(col("local_amount"), lit(0L)).as("local_amount"),
      col("local_currency"),
      col("counterparty.name").as("counterparty_name"),
      col("counterparty.account_number").as("counterparty_account_num"),
      col("counterparty.sort_code").as("counterparty_sort_code"),
      col("merchant.id").as("merchant_id"),
      col("merchant.name").as("merchant_name"),
      col("merchant.category").as("merchant_category"),
      col("merchant.logo").as("merchant_logo"),
      col("merchant.emoji").as("merchant_emoji"),
      // false (not NULL) even when merchant is absent: the reference
      // initializes merchant_online/merchant_atm = False for every row
      // before the merchant check (api_client.py:59-78)
      coalesce(col("merchant.online"), lit(false)).as("merchant_online"),
      coalesce(col("merchant.atm"), lit(false)).as("merchant_atm"),
      col("merchant.address.address").as("merchant_address"),
      col("merchant.address.city").as("merchant_city"),
      col("merchant.address.postcode").as("merchant_postcode"),
      col("merchant.address.country").as("merchant_country"),
      col("merchant.address.latitude").as("merchant_latitude"),
      col("merchant.address.longitude").as("merchant_longitude"),
      col("merchant.google_places_id").as("merchant_google_places_id"),
      // JSON-serialized like the reference's json.dumps (load.py:117);
      // byte formatting differs (no space after commas, SQL NULL instead
      // of the string 'null'), which downstream consumers parse identically
      to_json(col("merchant.suggested_tags")).as("merchant_suggested_tags"),
      col("merchant.foursquare_id").as("merchant_foursquare_id"),
      col("merchant.website").as("merchant_website"))

  /** S2 — balance snapshot shaping: abs(spend_today) (api_client.py:219). */
  def shapeBalance(balance: DataFrame): DataFrame =
    balance.withColumn("spend_today", abs(col("spend_today")))

  /** Pot boolean flags the reference defaults to False on insert
    * (load.py:204-216, `pot.get(key, False)`).
    */
  private val potBoolDefaults = Seq(
    "isa_wrapper", "round_up", "is_tax_pot", "deleted", "locked",
    "available_for_bills", "has_virtual_cards")

  /** S3 — pots payload arrives as `{pots: [...]}`; explode to one row per
    * pot (api_client.py:138-155; load.py:164-235 iterates the list), with
    * the reference's False defaults on the boolean flags.
    */
  def explodePots(potsPayload: DataFrame): DataFrame = {
    val exploded = potsPayload.select(explode(col("pots")).as("pot")).select(col("pot.*"))
    potBoolDefaults.foldLeft(exploded) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, coalesce(col(c), lit(false))) else df
    }
  }
}

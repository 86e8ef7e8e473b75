package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-normalization operators (star-schema silver layer).
  *
  * Reference: the bronze→silver transform materializes two dimension tables
  * with `SELECT DISTINCT ... WHERE <keys> IS NOT NULL`
  * (/root/reference/src/sql/transform_bronze_to_silver.sql:1-35):
  *  - counterparties: composite key (account_num, sort_code), 3 attrs
  *  - merchants: key id, 16 attrs, first-writer-wins on attribute conflicts
  *
  * Both shapes are captured here as generic operators over any fact table.
  */
object Normalize {

  /** DISTINCT projection of `keyCols ++ attrCols` with NOT NULL keys — the
    * dimension-extract when attributes are functionally determined by keys.
    * One hash-aggregate shuffle on the full projection.
    */
  def distinctDim(fact: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    fact.filter(keyNotNull)
      .select((keyCols ++ attrCols).map(col): _*)
      .dropDuplicates(keyCols ++ attrCols)
  }

  /** Dimension extract when attributes may conflict across fact rows: keep
    * one row per key, the first under `order` (deterministic stand-in for
    * SQLite's INSERT OR IGNORE first-writer-wins).
    */
  def firstWriterDim(
      fact: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      order: Seq[Column]): DataFrame = {
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    Dedup.firstWriterWins(fact.filter(keyNotNull), keyCols, order)
      .select((keyCols ++ attrCols).map(col): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension build from append-only snapshots.
  *
  * The medallion bronze layer accumulates periodic snapshots (L2/L3 in the
  * reference pipeline); the warehouse-dimension form of that history is
  * Type-2: one row per (key, attribute-state) run with a validity
  * interval. Two windows partitioned by the key do all the work —
  * change-detect against the previous snapshot (null-safe, so a first
  * snapshot or a NULL attribute is handled), then close each run with the
  * next change's start. Both windows shuffle once on the key and scale
  * with the usual key-partitioned window machinery (no global sort).
  */
object Scd2 {

  /** Collapse `snapshots` (one row per key per `orderCol` observation)
    * into SCD2 rows: key cols + attr cols +
    *   `valid_from`  — first observation of this attribute state,
    *   `valid_to`    — start of the next state (exclusive), null if open,
    *   `is_current`  — valid_to is null.
    * Ties on (key, orderCol) must not exist (one snapshot per key per
    * observation point).
    */
  def buildScd2(snapshots: DataFrame, keyCols: Seq[String], orderCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val byKey = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    // a key's first snapshot always opens a run — detected on the order
    // column (never null), NOT the attributes: a first snapshot whose
    // attribute IS null would otherwise read as "no change" under <=>
    val changed: Column = lag(col(orderCol), 1).over(byKey).isNull ||
      attrCols
        .map(c => !(col(c) <=> lag(col(c), 1).over(byKey)))
        .reduce(_ || _)
    val runs = snapshots
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .drop("__chg")
    runs
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(orderCol)
  }
}

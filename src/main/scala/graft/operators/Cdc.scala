package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed change-data-capture merge (MERGE INTO semantics) over immutable
  * snapshots.
  *
  * The reference's bronze load is insert-only (L1); real feeds also carry
  * updates and deletes. [[applyChanges]] produces the next snapshot from
  * the previous one plus a changeset in ONE shuffled anti-join + union:
  * rows whose key is touched by any change drop out of the old snapshot,
  * and insert/update payloads come in from the changeset. At warehouse
  * scale this is the copy-on-write table-format merge: both sides shuffle
  * once on the key, nothing loops on the driver.
  */
object Cdc {

  /** Next snapshot after applying `changes` (same data columns as
    * `snapshot` plus `opCol` ∈ {"I","U","D"}).
    *
    * Semantics: D removes the key; I/U upsert the payload (an update to an
    * absent key inserts — upsert semantics; a delete of an absent key is a
    * no-op). The changeset must carry at most one row per key (CDC
    * compaction — picking the latest pre-merge — is
    * [[Dedup.firstWriterWins]] on a sequence column upstream).
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    val survivors = snapshot.join(touched, keys, "left_anti")
    val upserts = changes
      .filter(col(opCol).isin("I", "U"))
      .drop(opCol)
    survivors.unionByName(upserts)
  }
}

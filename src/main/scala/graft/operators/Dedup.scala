package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dedup / idempotent-load operators.
  *
  * Reference semantics reproduced here (citations into /root/reference):
  *  - insert-if-absent on primary key: src/load/load.py:25-128 (per-row
  *    `SELECT 1 ... WHERE id = ?` probe before INSERT) and the
  *    `INSERT OR IGNORE` statements in src/sql/transform_bronze_to_silver.sql.
  *  - first-writer-wins among duplicates: SQLite `INSERT OR IGNORE` keeps the
  *    first row seen per key (transform_bronze_to_silver.sql:10-35). SQLite's
  *    pick order is scan order (unspecified from SQL); we require an explicit
  *    deterministic `order` so results are reproducible and oracle-comparable
  *    (SURVEY.md §7.4).
  *
  * Scale notes: `insertIfAbsent` is a shuffle-on-key anti join — Catalyst
  * picks broadcast when `existing` is small, sort-merge otherwise; AQE can
  * convert at runtime. `firstWriterWins` is a single shuffle on the key
  * (window partitionBy); no driver-side loops anywhere.
  */
object Dedup {

  /** Exact dedup on key columns; arbitrary survivor (hash-agg, one shuffle). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic first-writer-wins: keep, per key, the first row under
    * `order` (must be a total order within each key group).
    */
  def firstWriterWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Rows of `incoming` whose key is absent from `existing` — the append set
    * for an idempotent keyed load (anti join; Delta MERGE WHEN NOT MATCHED
    * is the transactional form of the same plan at warehouse scale).
    */
  def insertIfAbsent(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** Blocked fuzzy entity resolution over a name column — the classic
    * record-linkage pipeline (block → bounded pairwise edit distance →
    * transitive closure → canonical survivor). Returns one
    * (`nameCol`, canonical) row per DISTINCT name value; rows whose name
    * matched nothing map to themselves.
    *
    * Scale contract: comparisons happen on the DISTINCT-name dictionary
    * (canonicalize-first — a billion rows of one misspelling cost one
    * node), and only within a block (`blockExpr` over the name), the
    * standard recall-for-scale trade: a true match split across blocks is
    * consciously forfeited, so callers pick a block key coarse enough for
    * their typo model (last token here — typos concentrate in prefixes —
    * phonetic keys or q-gram buckets for harder corpora). Pairwise work
    * is Σ|block|² over distinct names; the expansion back to fact rows is
    * the caller's broadcast-size hash join on the returned dictionary.
    */
  def fuzzyNameClusters(names: DataFrame, nameCol: String,
      blockExpr: Column, maxDistance: Int = 2): DataFrame = {
    val n = names.select(col(nameCol)).distinct()
      .withColumn("__blk", blockExpr)
    val cand = n.as("a").join(n.as("b"),
        col("a.__blk") === col("b.__blk")
          && col(s"a.$nameCol") < col(s"b.$nameCol"))
      .filter(levenshtein(col(s"a.$nameCol"), col(s"b.$nameCol")) <= maxDistance)
      .select(col(s"a.$nameCol").as("__na"), col(s"b.$nameCol").as("__nb"))
    val comp = Components.connectedComponents(cand, "__na", "__nb")
      .select(col("id").as(nameCol), col("cluster_id").as("canonical"))
    n.select(col(nameCol)).join(comp, Seq(nameCol), "left")
      .withColumn("canonical", coalesce(col("canonical"), col(nameCol)))
  }
}

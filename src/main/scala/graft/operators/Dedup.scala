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

  /** Cross-document repeated-substring profile — the first phase of
    * exact-substring training-data dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): every `w`-token window
    * is hashed; a window whose hash occurs in ≥ 2 DISTINCT documents is a
    * cross-corpus repeat, and each document reports how many of its tokens
    * are covered by at least one repeated window. Returns one row per
    * document: (doc_id, n_tokens, dup_tokens, dup_frac).
    *
    * Scale contract: inherently clone-LINEAR — there is no pair join
    * anywhere, so a boilerplate block shared by g documents costs g flagged
    * rows, not g². One corpus scan emits the window hashes from the token
    * array in a codegen'd `transform` (no explode-then-self-join); the only
    * shuffles are the hash-keyed distinct-doc count, the flag join back,
    * and a doc-keyed window whose state is one document's flagged
    * positions. Covered-token counting is an interval merge over sorted
    * window starts (consecutive starts closer than `w` overlap), exact,
    * not w·|flags|.
    */
  def crossDocRepeatProfile(docs: DataFrame, w: Int = 8): DataFrame = {
    // ONE corpus scan: per-doc token count + the w-token window hashes,
    // materialized together (Catalyst shares no subtrees — without the cut
    // the dup aggregate, the flag join, and the final count projection
    // each re-scan and re-tokenize the corpus: measured 3 scans in the
    // uncut plan). The cut frame holds ~one long per corpus token — the
    // deliberate trade of 1x-corpus block storage for 2 saved full
    // tokenize passes.
    val per = Components.cut(
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") >= w,
            transform(sequence(lit(1), (col("n_tokens") - (w - 1)).cast("int")),
              i => xxhash64(concat_ws("\u0001", slice(col("t"), i, lit(w))))))
            .otherwise(array().cast("array<bigint>")).as("hs")), None)
    // (doc_id, p, h): window start p (1-based); empty hs ⇒ no rows
    val grams = per.select(col("doc_id"), posexplode(col("hs")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    val dup = grams.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("h")
    val flagged = grams.join(dup, "h").select("doc_id", "p")
    val wnd = Window.partitionBy("doc_id").orderBy("p")
    val covered = flagged
      .withColumn("nxt", lead(col("p"), 1).over(wnd))
      .withColumn("cov",
        when(col("nxt").isNull || col("nxt") - col("p") >= w, lit(w.toLong))
          .otherwise(col("nxt") - col("p")))
      .groupBy("doc_id").agg(sum(col("cov")).as("dup_tokens"))
    per.select("doc_id", "n_tokens")
      .join(covered, Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_frac",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("dup_tokens").cast("double") / col("n_tokens"), 12)))
  }
}

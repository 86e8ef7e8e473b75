package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis surface over the `documents` table (driver north star §2b).
  * All-scalar queries are embarrassingly parallel (no shuffle before the
  * final ORDER BY); the word count is one explode + one hash aggregate.
  */
object TextQueries {

  /** Canonical-form fingerprinting: normalization + md5 (rolling-hash
    * whole-doc form; shingle-level fingerprints live in DedupQueries).
    */
  private val q13 = GraftQuery(
    "q13_text_fingerprint",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          fingerprint(col("text")).as("fp"),
          length(normalizeText(col("text"))).cast("long").as("norm_len"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
                   CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT) AS norm_len
            FROM documents ORDER BY doc_id"""))

  /** Token counting: whitespace tokens + BPE-ish subword proxy + mean token
    * length.
    */
  private val q14 = GraftQuery(
    "q14_text_token_stats",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
          meanTokenLength(col("text")).as("mean_token_len"))
        .orderBy("doc_id"),
    Some("""WITH norm AS (
              SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt, text
              FROM documents)
            SELECT doc_id,
                   CAST(CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
                   CAST(length(nt) - (CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END) + 1 AS DOUBLE)
                     / NULLIF(CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END, 0) AS mean_token_len
            FROM norm ORDER BY doc_id"""))

  /** Corpus word count, top 100: tokenize → explode → hash aggregate.
    * Map-side partial aggregation keeps the shuffle at |vocabulary| rows.
    */
  private val q15 = GraftQuery(
    "q15_text_wordcount_top100",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(100),
    Some("""SELECT word, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(
                    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS word
                  FROM documents)
            WHERE length(word) > 0
            GROUP BY word ORDER BY cnt DESC, word LIMIT 100"""))

  /** Quality scoring: saturating length credit + stopword-naturalness +
    * word-shape credits (pure arithmetic; see TextFunctions.qualityScore).
    */
  private val q16 = GraftQuery(
    "q16_text_quality",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          stopwordRatio(col("text")).as("stopword_ratio"),
          punctRatio(col("text")).as("punct_ratio"),
          qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id, text,
                     string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks,
                     CASE WHEN length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) = 0 THEN 0
                          ELSE len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) END AS n,
                     length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS nlen
              FROM documents),
            m AS (
              SELECT doc_id, text, n,
                     CAST(len(list_filter(toks, t -> t IN
                       ('the','a','an','and','of','in','to','is','it','for','on','with'))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS stopword_ratio,
                     CAST(nlen - n + 1 AS DOUBLE) / NULLIF(n, 0) AS mean_len
              FROM t)
            SELECT doc_id, stopword_ratio,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                     / NULLIF(length(text), 0) AS punct_ratio,
                   0.4 * least(1.0, CAST(n AS DOUBLE) / 50.0)
                   + 0.3 * (1.0 - least(1.0, abs(stopword_ratio - 0.45) * 2.0))
                   + 0.3 * (1.0 - least(1.0, abs(mean_len - 5.0) / 5.0)) AS quality
            FROM m ORDER BY doc_id"""))

  /** Language-ID heuristic (CJK script check + per-language stopword argmax).
    * Rows-only check: the heuristic is not reasonably oracle-expressible and
    * the corpus carries no ground truth in its text (the `lang` label is
    * independent of content); accuracy is unit-tested on real multilingual
    * fixtures in TextFunctionsSpec.
    */
  private val q17 = GraftQuery(
    "q17_text_langid",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          col("lang").as("labeled_lang"),
          languageId(col("text")).as("predicted_lang"))
        .orderBy("doc_id"),
    None)

  val all: Seq[GraftQuery] = Seq(q13, q14, q15, q16, q17)
}

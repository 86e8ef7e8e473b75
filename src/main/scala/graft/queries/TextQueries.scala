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
                   md5(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g')))) AS fp,
                   CAST(length(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g')))) AS BIGINT) AS norm_len
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
              SELECT doc_id, lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS nt, text
              FROM documents)
            SELECT doc_id,
                   CAST(CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]')) AS BIGINT) AS n_bpeish,
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
                    lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))), ' ')) AS word
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
                     string_split(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))), ' ') AS toks,
                     CASE WHEN length(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g')))) = 0 THEN 0
                          ELSE len(string_split(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))), ' ')) END AS n,
                     length(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g')))) AS nlen
              FROM documents),
            m AS (
              SELECT doc_id, text, n,
                     CAST(len(list_filter(toks, t -> t IN
                       ('the','a','an','and','of','in','to','is','it','for','on','with'))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS stopword_ratio,
                     CAST(nlen - n + 1 AS DOUBLE) / NULLIF(n, 0) AS mean_len
              FROM t)
            SELECT doc_id, stopword_ratio,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\r\f\x0B]')) AS DOUBLE)
                     / NULLIF(length(text), 0) AS punct_ratio,
                   COALESCE(0.4 * least(1.0, CAST(n AS DOUBLE) / 50.0)
                   + 0.3 * (1.0 - least(1.0, abs(stopword_ratio - 0.45) * 2.0))
                   + 0.3 * (1.0 - least(1.0, abs(mean_len - 5.0) / 5.0)), 0.0) AS quality
            FROM m ORDER BY doc_id"""))

  /** Language-ID heuristic (CJK script check + per-language stopword
    * argmax, ties to the earlier language). The fold's strictly-greater
    * update means the winner is the FIRST language attaining the overall
    * max — which the oracle expresses as an ordered CASE against
    * greatest(); accuracy on real multilingual text is unit-tested in
    * TextFunctionsSpec.
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
    Some("""WITH t AS (
              SELECT doc_id, lang AS labeled_lang, text,
                     string_split(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))), ' ') AS toks
              FROM documents),
            s AS (
              SELECT *,
                len(list_filter(toks, x -> list_contains(
                  ['the','a','of','and','in','is','to','it','that','for'], x))) AS s_en,
                len(list_filter(toks, x -> list_contains(
                  ['der','die','das','und','ist','nicht','ein','eine','mit','zu'], x))) AS s_de,
                len(list_filter(toks, x -> list_contains(
                  ['le','la','les','et','est','une','un','des','que','pas'], x))) AS s_fr,
                len(list_filter(toks, x -> list_contains(
                  ['el','los','y','es','una','un','las','que','por','con'], x))) AS s_es
              FROM t)
            SELECT doc_id, labeled_lang,
                   CASE WHEN text IS NULL THEN 'und'
                        WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                        WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                        WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                        WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                        WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                        ELSE 'es' END AS predicted_lang
            FROM s ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q13, q14, q15, q16, q17)
}

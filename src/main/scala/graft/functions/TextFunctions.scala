package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library (driver north star §2b: language-ID, quality
  * scoring, token counting, fingerprinting). Everything here is built from
  * codegen'd `functions._` / higher-order array functions — no UDFs — so the
  * operators stay inside whole-stage codegen and scale linearly with input.
  *
  * Determinism contract: each function has an exact ANSI-SQL equivalent
  * (used by the DuckDB oracles in TextQueries). Whitespace is matched with
  * an explicit character class, never `\s` — Java's `\s` includes vertical
  * tab U+000B while RE2's does not, so the shorthand silently diverges
  * between Spark and RE2-based engines.
  */
object TextFunctions {

  /** The whitespace class shared verbatim (modulo escaping) with the DuckDB
    * oracles: space, tab, LF, CR, FF, VT.
    */
  private val Ws = " \\t\\n\\r\\f\\x0B"

  /** Whitespace-collapsed, trimmed, lowercased canonical form. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, s"[$Ws]+", " ")))

  /** Jaro–Winkler similarity (native codegen'd expression,
    * DuckDB-`jaro_winkler_similarity`-pinned semantics — see
    * [[graft.expressions.StringSimExprs.JaroWinkler]]).
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.StringSimExprs.JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Whitespace tokens of the normalized text (no empty tokens). */
  def tokens(c: Column): Column =
    split(normalizeText(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(normalizeText(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish subword proxy count: alphanumeric runs and single
    * non-alphanumeric, non-space marks each count as one token — a cheap,
    * deterministic stand-in for a learned tokenizer's piece count.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(s"[A-Za-z0-9]+|[^A-Za-z0-9$Ws]"), lit(0)))

  /** Mean token length, derived arithmetically from the normalized form
    * (single-space joined ⇒ sum(len) = length - (n-1)).
    */
  def meanTokenLength(c: Column): Column = {
    val n = tokenCount(c)
    ((length(normalizeText(c)) - n + 1).cast("double") / nullif(n, lit(0)).cast("double"))
  }

  private[graft] val englishStopwords =
    Seq("the", "a", "an", "and", "of", "in", "to", "is", "it", "for", "on", "with")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = tokens(c)
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
    hits.cast("double") / nullif(size(toks), lit(0)).cast("double")
  }

  /** Punctuation-to-character ratio over the raw text. */
  def punctRatio(c: Column): Column =
    size(regexp_extract_all(c, lit(s"[^A-Za-z0-9$Ws]"), lit(0))).cast("double") /
      nullif(length(c), lit(0)).cast("double")

  /** Composite document-quality score in [0,1]:
    *   0.4 · saturating length credit (full at ≥50 tokens)
    * + 0.3 · closeness of the stopword ratio to natural English prose (~0.45)
    * + 0.3 · closeness of mean token length to typical prose (~5 chars).
    * Pure arithmetic over the counts above — identical in any ANSI engine.
    * Empty/whitespace-only text scores 0 (the ratios are undefined there,
    * but "no content" is the lowest quality, not an unknown one).
    */
  def qualityScore(c: Column): Column = {
    val lenCredit = least(lit(1.0), tokenCount(c).cast("double") / lit(50.0))
    val stopCredit = lit(1.0) - least(lit(1.0), abs(stopwordRatio(c) - lit(0.45)) * lit(2.0))
    val wordCredit = lit(1.0) - least(lit(1.0), abs(meanTokenLength(c) - lit(5.0)) / lit(5.0))
    coalesce(
      lit(0.4) * lenCredit + lit(0.3) * stopCredit + lit(0.3) * wordCredit,
      lit(0.0))
  }

  /** Whole-document fingerprint: md5 of the normalized text (md5 is
    * byte-identical across engines, unlike xxhash64/murmur).
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[graft] val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Redact common PII shapes — emails, IPv4 addresses, phone-like digit
    * runs — with typed placeholders. Replacement ORDER is part of the
    * contract (emails first so their digits can't half-match as phones,
    * IPs before phones for the same reason) and is mirrored verbatim in
    * the DuckDB oracle. Patterns use explicit character classes only:
    * Java and RE2 disagree on `\s`/`\d` shorthand but agree on these.
    * One codegen'd projection — runs at scan speed on 100 TB.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  private val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "is", "to", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "que", "pas"),
    "es" -> Seq("el", "los", "y", "es", "una", "un", "las", "que", "por", "con"))

  /** n-gram/stopword language-ID heuristic: CJK script presence ⇒ zh;
    * otherwise the language whose stopword list hits the most tokens
    * (ties → earlier list; no hits ⇒ "und" for undetermined).
    */
  def languageId(c: Column): Column = {
    val toks = tokens(c)
    val scores = stopwordsByLang.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
    }
    val best = scores.tail.foldLeft[(Column, Column)]((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best._2 > 0, best._1)
      .otherwise(lit("und"))
  }
}

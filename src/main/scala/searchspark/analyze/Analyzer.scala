package searchspark.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis pipeline — the engine's only scalar-function surface,
  * mirroring the reference's `LemmaFinder` (119 LoC,
  * /root/reference/src/main/java/searchengine/services/supportingservices/LemmaFinder.java):
  *
  *  - B1 tokenize (LemmaFinder.java:103-108): lowercase, every char
  *    outside the letter alphabet → space, split on whitespace. The
  *    reference's alphabet is Russian `[а-яё]`; transcripts are English,
  *    so the alphabet generalizes to `[a-z0-9]` (SURVEY.md §2.2 B1).
  *  - B2 short-token filter (LemmaFinder.java:39-41): drop blank and
  *    1-char tokens except a keep-list (reference keeps "я"; English
  *    analog keeps "a", "i").
  *  - B3 particle/stop filter (LemmaFinder.java:13,90-101): the reference
  *    drops words whose morphology is interjection/preposition/
  *    conjunction/particle; functional stand-in is a curated stopword
  *    list, shared verbatim between index side, query side, scalar
  *    oracle, and the DuckDB oracle SQL.
  *  - B4 lemmatize (LemmaFinder.java:49-54, first-normal-form-only rule):
  *    deterministic suffix-strip rules (no morphology jar offline,
  *    SURVEY.md §7.0). Rule order is part of the spec — first match wins.
  *
  * Everything here exists in three synchronized forms:
  *  1. pure Scala functions (used by the scalar oracle, snippets, and the
  *     query side on the driver);
  *  2. Catalyst `Column` expressions (codegen'd, used by the distributed
  *     build — NO Scala UDF in the hot path);
  *  3. ANSI SQL fragments (graft.SparkEntry.oracleSql, DuckDB-checked).
  * Tests in AnalyzerSpec pin 1 == 2 on generated corpora.
  */
object Analyzer {

  /** 1-char tokens kept by B2 (reference keep-list is {"я"}). */
  val KeepShort: Set[String] = Set("a", "i")

  /** B3 stand-in stopword list: English words of EXACTLY the POS classes
    * the reference filters — prepositions, conjunctions, particles
    * (incl. articles), interjections (LemmaFinder.java:13 filters only
    * МЕЖД/ПРЕДЛ/СОЮЗ/ЧАСТ). Pronouns and verbs deliberately survive,
    * like "я" survives in the reference (which is why "i" is NOT here
    * and the B2 keep-list matters). Sorted, deterministic; the SQL
    * oracle embeds this same list as an IN-list. */
  val Stopwords: Array[String] = Array(
    "a", "about", "above", "after", "ah", "an", "and", "as", "at",
    "because", "before", "between", "but", "by", "down", "during", "for",
    "from", "hey", "if", "in", "into", "nor", "not", "of", "off", "oh",
    "on", "or", "out", "over", "per", "so", "than", "the", "though",
    "to", "too", "under", "unless", "until", "up", "via", "while",
    "with", "yet")

  private val stopSet: Set[String] = Stopwords.toSet

  /** Tokenizer character class: anything NOT in it becomes a space.
    * (Reference: `[^а-яё\s]` → space, LemmaFinder.java:105.) */
  val TokenAlphabet = "a-z0-9"

  // ---------------------------------------------------------------------
  // Form 1: pure Scala (driver / oracle / snippet side)
  // ---------------------------------------------------------------------

  /** B1: raw tokens of a text, in order. */
  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val cleaned = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(s"[^$TokenAlphabet]+", " ").trim
    if (cleaned.isEmpty) Array.empty else cleaned.split(" ")
  }

  /** B2: keep tokens of length > 1, or 1-char tokens on the keep-list. */
  def keepToken(tok: String): Boolean =
    tok.length > 1 || KeepShort.contains(tok)

  /** B3: true if the token survives the stop filter. */
  def notStopword(tok: String): Boolean = !stopSet.contains(tok)

  /** B4: deterministic suffix-strip lemmatizer. First matching rule
    * wins (mirrors the reference's first-normal-form-only choice,
    * LemmaFinder.java:54). Keep in sync with [[lemmaCol]] and
    * [[lemmaSqlCase]]. */
  def lemma(tok: String): String = {
    val n = tok.length
    if (n <= 3) tok
    else if (tok.endsWith("sses")) tok.substring(0, n - 2)            // sses -> ss
    else if (tok.endsWith("ies") && n > 4) tok.substring(0, n - 3) + "y" // ies -> y
    else if (tok.endsWith("ss")) tok                                   // ss -> ss
    else if (tok.endsWith("s")) tok.substring(0, n - 1)                // s -> ''
    else if (tok.endsWith("ing") && n > 5) tok.substring(0, n - 3)     // ing -> ''
    else if (tok.endsWith("ed") && n > 4) tok.substring(0, n - 2)      // ed -> ''
    else tok
  }

  /** Full pipeline B1→B4: analyzed terms of a text, in order. */
  def analyze(text: String): Array[String] =
    tokenize(text).filter(keepToken).filter(notStopword).map(lemma)

  /** B5 (per-doc TF, LemmaFinder.java:34-64 `collectLemmas`): term →
    * occurrence count. */
  def termFreqs(text: String): Map[String, Int] =
    analyze(text).groupBy(identity).map { case (t, o) => (t, o.length) }

  /** B7 (query analysis, SearchingServiceImpl.java:215-217): distinct
    * query terms, in ascending term order (the deterministic summation
    * order of SURVEY.md §7.4). */
  def analyzeQuery(query: String): Seq[String] =
    analyze(query).distinct.sorted

  // ---------------------------------------------------------------------
  // Form 2: Catalyst Column expressions (distributed build — codegen'd)
  // ---------------------------------------------------------------------

  /** B1 as a Column: array of raw tokens of `text`. */
  def tokensCol(text: Column): Column = {
    val cleaned = trim(regexp_replace(lower(text), s"[^$TokenAlphabet]+", " "))
    when(cleaned === "", array().cast("array<string>"))
      .otherwise(split(cleaned, " "))
  }

  /** B4 as a Column over a single token column (rule-for-rule identical
    * to [[lemma]]; first matching WHEN wins, same order). */
  def lemmaCol(tok: Column): Column = {
    val n = length(tok)
    when(n <= 3, tok)
      .when(tok.endsWith("sses"), tok.substr(lit(1), n - 2))
      .when(tok.endsWith("ies") && n > 4, concat(tok.substr(lit(1), n - 3), lit("y")))
      .when(tok.endsWith("ss"), tok)
      .when(tok.endsWith("s"), tok.substr(lit(1), n - 1))
      .when(tok.endsWith("ing") && n > 5, tok.substr(lit(1), n - 3))
      .when(tok.endsWith("ed") && n > 4, tok.substr(lit(1), n - 2))
      .otherwise(tok)
  }

  /** B4 as a SQL expression string over a token-valued identifier
    * (single source of truth for Column + SQL forms; Spark and DuckDB
    * both accept this ANSI CASE). */
  def lemmaSqlCase(tok: String): String =
    s"""CASE
       | WHEN length($tok) <= 3 THEN $tok
       | WHEN $tok LIKE '%sses' THEN substring($tok, 1, length($tok) - 2)
       | WHEN $tok LIKE '%ies' AND length($tok) > 4 THEN substring($tok, 1, length($tok) - 3) || 'y'
       | WHEN $tok LIKE '%ss' THEN $tok
       | WHEN $tok LIKE '%s' THEN substring($tok, 1, length($tok) - 1)
       | WHEN $tok LIKE '%ing' AND length($tok) > 5 THEN substring($tok, 1, length($tok) - 3)
       | WHEN $tok LIKE '%ed' AND length($tok) > 4 THEN substring($tok, 1, length($tok) - 2)
       | ELSE $tok
       |END""".stripMargin.replaceAll("\\s+", " ").trim

  /** B2 filter as a SQL boolean over a token identifier. */
  def keepSqlPredicate(tok: String): String =
    s"(length($tok) > 1 OR $tok IN (${KeepShort.toSeq.sorted.map(s => s"'$s'").mkString(", ")}))"

  /** B3 filter as a SQL boolean over a token identifier. */
  def notStopSqlPredicate(tok: String): String =
    s"$tok NOT IN (${Stopwords.map(s => s"'$s'").mkString(", ")})"

  /** B1 as a SQL expression producing an array of raw tokens (ANSI-ish;
    * works in Spark SQL. DuckDB needs string_split instead of split —
    * see graft.SparkEntry.oracleSql which holds the DuckDB dialect). */
  def tokensSqlSpark(text: String): String =
    s"split(trim(regexp_replace(lower($text), '[^$TokenAlphabet]+', ' ')), ' ')"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for training-data pipelines (SURVEY.md §2.9):
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * All built from codegen'd `sql.functions` (no UDFs in the hot path) and
  * mirrored 1:1 by DuckDB oracle SQL: integer-derived arithmetic only, so
  * results are bitwise deterministic across engines.
  */
object TextFunctions {

  /** Whitespace word list. Spark `split` and DuckDB `string_split` agree on
    * single-space separators (empties kept for runs of spaces).
    */
  def words(text: Column): Column = split(text, " ", -1)

  /** replace-based (regex-free) occurrence count; ` padded ` for word hits.
    * Counts NON-OVERLAPPING matches: adjacent word hits share the
    * delimiting space, so "the the the" scores 2, not 3 — a deliberate
    * heuristic trade (and exactly what the DuckDB oracle mirrors); use a
    * regex count where exact word frequency matters.
    */
  def countMarker(padded: Column, marker: String): Column =
    ((length(padded) - length(replace(padded, lit(marker), lit("")))) / lit(marker.length)).cast("long")

  /** Stopword-marker languages for the heuristic language-ID. Markers are
    * space-delimited so they hit whole words in ` text ` padding.
    */
  val LangMarkers: Seq[(String, String)] =
    Seq("en" -> " the ", "fr" -> " le ", "de" -> " der ", "es" -> " el ")

  /** N-gram/stopword heuristic language ID: score = marker hits; prediction
    * by fixed priority order (en > fr > de > es) on ties.
    */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    LangMarkers.map { case (lang, m) => lang -> countMarker(padded, m) }
  }

  def predictedLang(sEn: Column, sFr: Column, sDe: Column, sEs: Column): Column =
    when(sEn.isNull, lit(null).cast("string")) // null text -> null, not "es"
      .when(sEn >= greatest(sFr, sDe, sEs), lit("en"))
      .when(sFr >= greatest(sDe, sEs), lit("fr"))
      .when(sDe >= sEs, lit("de"))
      .otherwise(lit("es"))

  /** Whitespace token count. */
  def wordCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token estimate: ceil(bytes / 4) — the usual chars-per-token
    * heuristic; deterministic integer arithmetic.
    */
  def bpeEstimate(text: Column): Column =
    ceil(octet_length(text).cast("double") / lit(4.0)).cast("long")

  /** BPE-ish piece pattern: letter runs, digit runs, or single symbols —
    * simple enough that Java regex (Spark) and RE2 (DuckDB) agree.
    */
  val PiecePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Regex piece count — the tokenizer-shaped split of [[PiecePattern]]. */
  def regexPieces(text: Column): Column =
    size(regexp_extract_all(text, lit(PiecePattern), lit(0))).cast("long")

  /** Punctuation count (period + comma) via replace, regex-free. */
  def punctCount(text: Column): Column =
    (length(text) - length(replace(replace(text, lit("."), lit("")), lit(","), lit("")))).cast("long")

  /** Composite quality score in [0,1]: length component + stopword-density
    * component. All inputs integer-derived → identical doubles across engines.
    */
  def qualityScore(nWords: Column, nStop: Column, nPunct: Column): Column = {
    val lenComp  = least(nWords.cast("double") / lit(200.0), lit(1.0))
    val stopComp = least(nStop.cast("double") * lit(5.0) / greatest(nWords, lit(1L)).cast("double"), lit(1.0))
    val punctPen = lit(1.0) / (lit(1.0) + nPunct.cast("double"))
    round(lit(0.5) * lenComp + lit(0.3) * stopComp + lit(0.2) * punctPen, 6)
  }

  /** Adds the quality-feature and score columns (n_words, n_stop, n_punct,
    * quality) — the single source of the scoring formula, shared by the
    * q27 query and the curation funnel.
    */
  def withQualityColumns(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val padded = concat(lit(" "), col(textCol), lit(" "))
    val nStop = countMarker(padded, " the ") +
      countMarker(padded, " a ") +
      countMarker(padded, " of ")
    df.withColumn("n_words", wordCount(col(textCol)))
      .withColumn("n_stop", nStop)
      .withColumn("n_punct", punctCount(col(textCol)))
      .withColumn("quality", qualityScore(col("n_words"), col("n_stop"), col("n_punct")))
  }

  /** Gopher/MassiveText-style quality-rule battery (Rae et al. 2021, §A1.1
    * "quality filtering", re-derived for a newline-free corpus): six boolean
    * per-document rules, each an integer-arithmetic comparison so Spark and
    * the DuckDB oracle agree bitwise. A production curation pass keeps docs
    * with ALL flags true; the q95 readout aggregates pass rates per source
    * (the calibration a curation team reads before committing thresholds).
    *
    * Scale shape: pure per-row map over the words array — no shuffle, no
    * UDF, stays inside whole-stage codegen; the per-doc repetition scan is
    * O(distinct·words) on bounded-length documents.
    *
    * Null text yields null flags — callers decide drop-vs-fail semantics
    * (q95 filters nulls explicitly).
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val padded = concat(lit(" "), t, lit(" "))
    val nWords = size(w).cast("long")
    // Sum of word characters == chars minus separators (single-space split).
    val sumChars = length(replace(t, lit(" "), lit(""))).cast("long")
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    // Mode count: for each distinct word, occurrences in the full list.
    val maxRep = array_max(transform(array_distinct(w), x => size(filter(w, y => y === x)))).cast("long")
    val nStop = countMarker(padded, " the ") + countMarker(padded, " a ") + countMarker(padded, " of ")
    df.withColumn("n_words", nWords)
      .withColumn("r_wordcount", nWords.between(10L, 100000L))
      // mean word length in [3, 10] — integer cross-multiplied
      .withColumn("r_meanlen", sumChars >= nWords * 3 && sumChars <= nWords * 10)
      // >= 80% of words contain an alphabetic character
      .withColumn("r_alpha", nAlpha * 5 >= nWords * 4)
      // at least 2 stop-word hits (the/a/of)
      .withColumn("r_stopwords", nStop >= 2L)
      // most frequent word <= 20% of all words
      .withColumn("r_repetition", maxRep * 5 <= nWords)
      // >= 30% distinct words (dup-word density)
      .withColumn("r_distinct", nDistinct * 10 >= nWords * 3)
  }

  /** Rolling polynomial (Rabin-Karp-style) fingerprint over codepoints:
    * fold(acc = acc*31 + cp mod 1e9+7). Backed by the native codegen'd
    * [[graft.plans.RollingHash]] expression (the interpreted
    * `aggregate(split(text,''))` formulation allocates a per-char array and
    * runs ~10× slower); replayable in DuckDB via `list_reduce`.
    */
  def polyFingerprint(text: Column): Column = graft.plans.RollingHash(text)

  /** Normalized content fingerprint (exact-dup key after normalization). */
  def md5Fingerprint(text: Column): Column = md5(lower(trim(text)))
}

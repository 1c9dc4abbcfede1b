package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The Gopher/MassiveText document-shape quality rules (Rae et al.
  * 2021, "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", arXiv:2112.11446, Appendix A1.1) — the standard
  * heuristic filter battery applied before training-data assembly
  * (reused by MassiveWeb descendants such as RefinedWeb and FineWeb):
  *
  *   1. word count within [minWords, maxWords] (paper: 50..100,000)
  *   2. mean word length within [3, 10] characters
  *   3. symbol-to-word ratio ≤ 0.1 for BOTH '#' and ellipsis '...'
  *   4. < 90% of lines start with a bullet point
  *   5. < 30% of lines end with an ellipsis
  *   6. ≥ 80% of words contain at least one alphabetic character
  *   7. at least 2 of the 8 English stop words
  *      {the, be, to, of, and, that, have, with} appear as tokens
  *
  * The within-document repetition rules from the same appendix live in
  * [[graft.functions.CatalystFunctions.repetitionStats]] (gate d15) —
  * compose `flags(...).filter(col("keep"))` with a repetition filter
  * for the full MassiveText battery.
  *
  * Scale shape: one pure map-side pass — every rule is arithmetic over
  * split/filter/regexp builtins on the row's own text, so the whole
  * battery fuses into the scan projection under whole-stage codegen
  * with NO shuffle and no UDF. Word tokens are maximal runs between
  * the EXPLICIT whitespace class [ \t\n\x0B\f\r] (java.regex and RE2
  * disagree on \s — the d32 lesson), so a DuckDB oracle reproduces
  * every count; the ratios are single divisions of exact small
  * integers, bit-identical cross-engine.
  */
object GopherRules {

  /** Explicit whitespace class — keep in the java.regex ∩ RE2
    * intersection (\s differs between the engines on \x0B). */
  private val wsClass = "[ \\t\\n\\x0B\\f\\r]+"

  /** The paper's stop-word list for rule 7 (the default; pass a
    * corpus-appropriate list for non-English or synthetic corpora —
    * the rule is "contains common function words", and a fixed English
    * list on e.g. a Chinese corpus rejects everything). */
  val stopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))

  /** The full rule column set over a text column — shared by the
    * projection form ([[flags]]) and the filter form ([[keep]]). */
  private def ruleCols(t: Column, minWords: Int, maxWords: Int,
      stops: Seq[String], minStopHits: Int): Seq[(String, Column)] = {
    require(minWords >= 0 && maxWords >= minWords,
      s"word-count bounds must satisfy 0 <= min <= max, got [$minWords, $maxWords]")
    require(stops.nonEmpty && minStopHits >= 0,
      s"need a non-empty stop list and minStopHits >= 0, got ${stops.length}/$minStopHits")
    // Raw whitespace-delimited words (rules 1, 2, 3, 6 speak about
    // words as typed, punctuation attached); split keeps leading/
    // trailing empties, the filter drops them in both engines.
    val wsTok = filter(split(t, wsClass), w => length(w) > lit(0))
    // Lowercase alnum tokens for the stop-word membership test (the
    // engine-wide word identity, TextFunctions.words).
    val lw = TextFunctions.words(t)
    val lines = split(t, "\n")
    val nWords = size(wsTok)
    val charSum = aggregate(wsTok, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    // both spellings of the ellipsis (review r12: counting only the
    // ASCII form let U+2026-heavy pages through the symbol rule while
    // the identical ASCII page was rejected)
    val nEllipsis = ((length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long") +
      (length(t) - length(regexp_replace(t, "\u2026", ""))).cast("long")
    val nLines = size(lines) // >= 1: split of "" is [""]
    val nBullet = size(filter(lines, l => l.rlike("^[ \\t]*[-*\u2022]")))
    // trailing \r tolerated (review r12: CRLF pages split on \n keep
    // the \r, which hid every line ending from the rule)
    val nEllipsisEnd = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|\u2026)[ \\t\\r]*$")))
    val nAlpha = size(filter(wsTok, w => w.rlike("[A-Za-z]")))
    val nStop = stops
      .map(sw => when(array_contains(lw, sw), 1).otherwise(0))
      .reduce(_ + _)

    val meanLen = ratio(charSum, nWords)
    val hashRatio = ratio(nHash, nWords)
    val ellipsisRatio = ratio(nEllipsis, nWords)
    val bulletFrac = nBullet.cast("double") / nLines.cast("double")
    val ellipsisLineFrac = nEllipsisEnd.cast("double") / nLines.cast("double")
    val alphaFrac = ratio(nAlpha, nWords)

    // Null ratios (empty doc) must FAIL their rule, not poison `keep`
    // with null — coalesce each threshold test to false.
    def pass(c: Column): Column = coalesce(c, lit(false))
    val rWordCount = nWords >= minWords && nWords <= maxWords
    val rMeanLen = pass(meanLen >= 3.0 && meanLen <= 10.0)
    val rSymbol = pass(hashRatio <= 0.1 && ellipsisRatio <= 0.1)
    val rBullet = bulletFrac < 0.9
    val rEllipsis = ellipsisLineFrac < 0.3
    val rAlpha = pass(alphaFrac >= 0.8)
    val rStop = nStop >= minStopHits

    Seq(
      "n_words" -> nWords.cast("int"),
      "mean_word_len" -> meanLen,
      "hash_ratio" -> hashRatio,
      "ellipsis_ratio" -> ellipsisRatio,
      "bullet_frac" -> bulletFrac,
      "ellipsis_line_frac" -> ellipsisLineFrac,
      "alpha_frac" -> alphaFrac,
      "n_stop_hits" -> nStop,
      "r_word_count" -> rWordCount,
      "r_mean_word_len" -> rMeanLen,
      "r_symbol_ratio" -> rSymbol,
      "r_bullet_lines" -> rBullet,
      "r_ellipsis_lines" -> rEllipsis,
      "r_alpha_words" -> rAlpha,
      "r_stop_words" -> rStop,
      "keep" -> (rWordCount && rMeanLen && rSymbol && rBullet &&
        rEllipsis && rAlpha && rStop))
  }

  /** Per-document rule features and flags. Output: the id column,
    * the numeric features (n_words, mean_word_len, hash_ratio,
    * ellipsis_ratio, bullet_frac, ellipsis_line_frac, alpha_frac,
    * n_stop_hits), one boolean per rule (r_word_count .. r_stop_words)
    * and `keep` = every rule passed. Feature columns are UNROUNDED
    * doubles (exact quotients of small ints); round at the edge if a
    * report needs fixed precision. */
  def flags(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Int = 50,
      maxWords: Int = 100000, stops: Seq[String] = stopWords,
      minStopHits: Int = 2): DataFrame = {
    val cols = ruleCols(col(textCol), minWords, maxWords, stops, minStopHits)
    docs.select(col(idCol) +: cols.map { case (n, c) => c.as(n) }: _*)
  }

  /** The filter form: documents passing every rule, original columns
    * untouched (the composable curation stage) — one map-side filter
    * that fuses into the scan, no join. NB (review r12, measured in
    * d48): a FILTER predicate gets no whole-stage-codegen
    * subexpression elimination, so the battery re-tokenizes the text
    * per rule reference here; when the text column is itself an
    * expensive expression, prefer [[keepCol]] inside a projection /
    * aggregation (both CSE) over this form. */
  def keep(docs: DataFrame, textCol: String = "text", minWords: Int = 50,
      maxWords: Int = 100000, stops: Seq[String] = stopWords,
      minStopHits: Int = 2): DataFrame =
    docs.filter(
      ruleCols(col(textCol), minWords, maxWords, stops, minStopHits).last._2)

  /** The `keep` verdict as a COLUMN over a text column — for
    * aggregation-side gating (`count(when(keep, 1))`), where
    * HashAggregate's subexpression elimination evaluates the shared
    * tokenization once instead of once per rule (see [[keep]]'s
    * caveat). */
  def keepCol(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      stops: Seq[String] = stopWords, minStopHits: Int = 2): Column =
    ruleCols(text, minWords, maxWords, stops, minStopHits).last._2
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** The paper's stop-word list for rule 7 (the default; pass a
    * corpus-appropriate list for non-English or synthetic corpora —
    * the rule is "contains common function words", and a fixed English
    * list on e.g. a Chinese corpus rejects everything). */
  val stopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))

  /** The full rule column set over a STATS STRUCT column (the
    * [[graft.functions.GopherStatsExpr]] output) — shared by the
    * projection form ([[flags]]) and the filter form ([[keep]]).
    *
    * Callers MUST materialize the struct in its OWN projection and
    * pass the resulting ATTRIBUTE here (the d04 two-select pattern):
    * whole-stage codegen does NOT subexpression-eliminate a repeated
    * expensive expression, so inlining the stats expression under
    * these ~16 field references re-ran the full text pass per
    * reference (measured 13.9 s vs 0.9 s for one pass at 10x scale);
    * two stacked projections survive because CollapseProject refuses
    * to duplicate a non-cheap, multiply-referenced producer. */
  private def ruleCols(g: Column, minWords: Int, maxWords: Int,
      minStopHits: Int): Seq[(String, Column)] = {
    require(minWords >= 0 && maxWords >= minWords,
      s"word-count bounds must satisfy 0 <= min <= max, got [$minWords, $maxWords]")
    require(minStopHits >= 0,
      s"minStopHits must be >= 0, got $minStopHits")
    val nWords = g.getField("n_words")
    val charSum = g.getField("char_sum")
    val nHash = g.getField("n_hash")
    val nEllipsis = g.getField("n_ellipsis")
    val nLines = g.getField("n_lines")
    val nBullet = g.getField("n_bullet")
    val nEllipsisEnd = g.getField("n_ell_end")
    val nAlpha = g.getField("n_alpha")
    val nStop = g.getField("n_stop")

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
      "n_alnum_words" -> g.getField("n_alnum"),
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
      minStopHits: Int = 2, carry: Seq[String] = Seq.empty): DataFrame = {
    require(stops.nonEmpty, "need a non-empty stop list")
    // struct in its own projection; rules read the ATTRIBUTE (see
    // ruleCols — one text pass per row instead of one per rule)
    val withStats = docs.select(
      (Seq(col(idCol)) ++ carry.map(col) :+
        graft.functions.CatalystFunctions.gopherStats(col(textCol), stops)
          .as("__g")): _*)
    val cols = ruleCols(col("__g"), minWords, maxWords, minStopHits)
    withStats.select(
      (Seq(col(idCol)) ++ carry.map(col) ++
        cols.map { case (n, c) => c.as(n) }): _*)
  }

  /** The filter form: documents passing every rule, original columns
    * untouched (the composable curation stage) — one map-side filter,
    * no join. NB: predicate pushdown can substitute the stats struct
    * back under the filter's ~12 rule references (no codegen CSE in a
    * predicate) — fine on a raw text column, but when the text is
    * itself an expensive expression (d48's markdown strip), gate at
    * the AGGREGATION over a [[flags]] carry instead. */
  def keep(docs: DataFrame, textCol: String = "text", minWords: Int = 50,
      maxWords: Int = 100000, stops: Seq[String] = stopWords,
      minStopHits: Int = 2): DataFrame = {
    require(stops.nonEmpty, "need a non-empty stop list")
    docs
      .withColumn("__g",
        graft.functions.CatalystFunctions.gopherStats(col(textCol), stops))
      .filter(ruleCols(col("__g"), minWords, maxWords, minStopHits).last._2)
      .drop("__g")
  }

  /** The `keep` verdict as a COLUMN over a PRE-MATERIALIZED stats
    * struct attribute (build it with
    * `CatalystFunctions.gopherStats(text, stops).as("__g")` in its
    * own projection — the [[ruleCols]] CSE contract). */
  def keepFromStats(g: Column, minWords: Int = 50, maxWords: Int = 100000,
      minStopHits: Int = 2): Column =
    ruleCols(g, minWords, maxWords, minStopHits).last._2
}

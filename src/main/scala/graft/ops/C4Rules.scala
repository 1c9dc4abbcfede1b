package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer",
  * arXiv:1910.10683 §2.2) — the line-level web-page cleaner behind the
  * C4 corpus:
  *
  *   - keep only lines that END in a terminal punctuation mark
  *     (period, exclamation, question mark, closing quote)
  *   - keep only lines with ≥ `minLineWords` words (paper: 5)
  *   - drop any page containing "lorem ipsum" (case-insensitive)
  *   - drop any page containing a curly brace '{' (code)
  *   - drop any page left with fewer than `minSentences` sentences
  *     (paper: 3; counted over the CLEANED text — the kept lines)
  *
  * The paper's remaining steps live elsewhere in this library: the
  * three-sentence-span dedup is [[Dedup.substringSpans]]/[[Dedup
  * .lineDedup]] (gates d29/d21), language ID is gate d05, and the
  * badword page filter is [[UrlOps]]-style blocklisting — C4Rules is
  * deliberately only the page-shape half so each stage composes.
  *
  * Scale shape: one pure map-side pass — line split, per-line word
  * count and punctuation test, and the page-level predicates are all
  * array/regexp builtins over the row's own text, fused into the scan
  * under whole-stage codegen; no shuffle, no UDF. Regexes stay in the
  * java.regex ∩ RE2 intersection (explicit whitespace class), so a
  * DuckDB oracle reproduces every kept line and count bit-for-bit.
  */
object C4Rules {

  private val wsClass = "[ \\t\\n\\x0B\\f\\r]+"

  /** Line keeper: ends in terminal punctuation — ignoring trailing
    * spaces, tabs, AND \r (review r12: rtrim strips only 0x20, so a
    * CRLF page split on \n kept a \r on every line and the whole
    * page silently cleaned to empty) — AND carries at least
    * `minLineWords` words. */
  private def lineKept(l: Column, minLineWords: Int): Column =
    l.rlike("[.!?\"][ \\t\\r]*$") &&
      size(filter(split(l, wsClass), w => length(w) > lit(0))) >= minLineWords

  /** The ONE copy of the page decomposition (review r12: flags/clean
    * each inlined it — a rule fix applied to one form would silently
    * desynchronize the other): (lines, kept lines, clean text,
    * sentence count, has_lorem, has_brace). */
  private def pageCols(t: Column, minLineWords: Int, minSentences: Int)
      : (Column, Column, Column, Column, Column, Column) = {
    require(minLineWords >= 1 && minSentences >= 1,
      s"minLineWords/minSentences must be >= 1, got $minLineWords/$minSentences")
    val lines = split(t, "\n")
    val kept = filter(lines, l => lineKept(l, minLineWords))
    val clean = array_join(kept, "\n")
    val nSentences = length(clean) -
      length(regexp_replace(clean, "[.!?]", ""))
    val hasLorem = contains(lower(t), lit("lorem ipsum"))
    val hasBrace = contains(t, lit("{"))
    (lines, kept, clean, nSentences, hasLorem, hasBrace)
  }

  /** Per-page C4 features and flags. Output: the id column, n_lines,
    * n_kept_lines, clean_text (kept lines re-joined with newlines),
    * n_sentences (terminal-punctuation count over clean_text),
    * has_lorem, has_brace, and `keep` (page survives: no lorem ipsum,
    * no brace, ≥ minSentences sentences after line cleaning). */
  def flags(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val (lines, kept, clean, nSentences, hasLorem, hasBrace) =
      pageCols(col(textCol), minLineWords, minSentences)
    docs.select(col(idCol), size(lines).as("n_lines"),
      size(kept).as("n_kept_lines"), clean.as("clean_text"),
      nSentences.as("n_sentences"), hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      // a null text yields null page features and a three-valued keep —
      // coalesce to false (the GopherRules.pass contract, ADVICE r12)
      // so a consumer counting rejections with filter(!keep) sees
      // null-text pages instead of silently skipping them; clean()'s
      // filter drops the same pages (NULL predicate = drop), so the
      // two forms agree
      coalesce(!hasLorem && !hasBrace && nSentences >= minSentences,
        lit(false)).as("keep"))
  }

  /** The pipeline form: surviving pages only, `textCol` REPLACED by
    * the cleaned text (other columns untouched) — the composable
    * curation stage, still one map-side pass. */
  def clean(docs: DataFrame, textCol: String = "text",
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val (_, _, cleanText, nSentences, hasLorem, hasBrace) =
      pageCols(col(textCol), minLineWords, minSentences)
    docs
      .filter(!hasLorem && !hasBrace && nSentences >= minSentences)
      .withColumn(textCol, cleanText)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline layer.
  *
  * Everything here is built from codegen'd Catalyst expressions
  * (regexp/array/hash builtins) — no UDFs — so whole-stage codegen spans
  * the full tokenize→shingle→hash pipeline and the operators scale
  * linearly over 100 TB of documents.
  */
object TextFunctions {

  /** Word tokens: maximal [a-z0-9] runs, case-insensitive alnum. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish tokens: alnum runs plus single non-space punctuation. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text,
      lit(s"[a-zA-Z0-9]+|[^a-zA-Z0-9$wsChars]"), lit(0))

  /** Word uni+bigram feature strings: the tokens plus space-joined
    * consecutive pairs — the shared featurizer of the DSIR scorer,
    * the fastText-shaped quality classifier, and gate d34 (extracted
    * in review r9; the guard was previously triplicated). The bigram
    * arm MUST be guarded: `sequence(1, size - 1)` DESCENDS on a
    * 1-word doc ([1, 0] — Spark auto-steps -1) and `element_at(ws, 0)`
    * is an error, not null. */
  def uniBigrams(ws: Column): Column = {
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ws, bigrams)
  }

  /** Distinct word n-gram shingles (space-joined); empty array when the
    * document has fewer than n words. */
  def shingles(ws: Column, n: Int = 3): Column = {
    val make = transform(
      sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    when(size(ws) >= n, array_distinct(make)).otherwise(array().cast("array<string>"))
  }

  /** Canonical-form fingerprint: md5 of the whitespace-normalized,
    * lower-cased text (reference-style doc identity for exact dedup
    * under formatting noise). Collapse BEFORE trim: trim() strips
    * only ' ' chars, so a trailing newline/tab must first become a
    * space or it survives as trailing whitespace and splits identical
    * docs (winnowFingerprints always had this order). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), lit(s"$wsClass+"), lit(" "))))

  /** Winnowed rolling-hash fingerprints (MOSS scheme) over normalized
    * text: lowercase, non-alphanumerics collapsed to single spaces, so
    * the alphabet is ASCII and any SQL engine reproduces the hashes.
    * Returns the sorted distinct selected k-gram hashes; any shared
    * substring of >= k+w-1 normalized chars yields a shared
    * fingerprint (the winnowing guarantee). */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 8): Column =
    CatalystFunctions.winnowHashes(
      trim(regexp_replace(lower(text), lit("[^a-z0-9]+"), lit(" "))), k, w)

  /** Per-language marker-word hit count. */
  def markerHits(ws: Column, markers: Seq[String]): Column = {
    val arr = array(markers.map(lit): _*)
    size(filter(ws, w => array_contains(arr, w)))
  }

  private val langMarkers: Seq[(String, Seq[String])] = TextFeaturesExpr.langMarkers

  /** N-gram/stopword heuristic language ID: argmax of marker hits with
    * a fixed priority tie-break (en > de > fr > es); "und" when no
    * marker matches. */
  def langId(ws: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> markerHits(ws, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, sc), els) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(els)
    }
  }

  private val stopwords = TextFeaturesExpr.stopwords

  /** All text features (n_chars, n_words, avg_word_len, stopword_ratio,
    * punct_ratio, lang) in ONE native tokenization pass — use this in
    * pipelines that consume several features; the composed single-
    * feature forms below re-tokenize per reference. */
  def textFeatures(text: Column): Column = CatalystFunctions.textFeatures(text)

  /** Quality-score feature struct: length, word stats, stopword and
    * punctuation ratios. All ratios double in [0,1], rounded.
    *
    * NOTE (review r9): [[textFeatures]] is the gate-proven path. This
    * composed form uses Spark's `round` (HALF_UP over the double's
    * SHORTEST decimal representation), while the native expression
    * rounds HALF_UP over the double's EXACT binary expansion — the
    * 4th decimal can differ for ratios whose shortest representation
    * ends exactly in ...5. Prefer the native struct when comparing
    * against the DuckDB oracles. */
  def qualityFeatures(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws)
    val charLen = length(text)
    val punct = length(regexp_replace(text,
      lit(s"[a-zA-Z0-9$wsChars]"), lit("")))
    val stopHits = markerHits(ws, stopwords)
    val totalWordChars = aggregate(ws, lit(0), (acc, w) => acc + length(w))
    struct(
      charLen.as("n_chars"),
      nWords.as("n_words"),
      round(when(nWords > 0, totalWordChars.cast("double") / nWords).otherwise(lit(0.0)), 4)
        .as("avg_word_len"),
      round(when(nWords > 0, stopHits.cast("double") / nWords).otherwise(lit(0.0)), 4)
        .as("stopword_ratio"),
      round(when(charLen > 0, punct.cast("double") / charLen).otherwise(lit(0.0)), 4)
        .as("punct_ratio"))
  }

  // PII patterns, deliberately restricted to syntax that means the same
  // thing in java.util.regex AND RE2-family engines (no lookaround, no
  // backrefs): any SQL oracle can re-run them verbatim.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** PII occurrence counts (emails, IPv4s, dashed intl phone numbers):
    * three codegen'd regexp passes, map-side only. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailRe)).as("n_emails"),
    regexp_count(text, lit(ipv4Re)).as("n_ips"),
    regexp_count(text, lit(phoneRe)).as("n_phones"))

  /** PII redaction: replace every email/IPv4/phone occurrence with a
    * typed placeholder token. Emails first (an address can embed
    * digit runs), then phones, then IPs; the placeholders contain no
    * digits or '@', so later passes cannot re-match earlier
    * replacements. Pure map-side regexp_replace chain — scales as one
    * scan, composes with scan pruning. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
        lit(phoneRe), lit("<PHONE>")),
      lit(ipv4Re), lit("<IP>"))

  /** 64-bit SimHash over word tokens (duplicates weighted): bit j of the
    * output is set when the sum over words of ±1 votes (per bit of the
    * word's hash) is positive. Native Catalyst expression
    * (graft.functions.SimHash64Expr) — the builtin-composed fold was a
    * 64-wide interpreted zip per word. */
  def simhash64(ws: Column): Column = CatalystFunctions.simhash64(ws)

  /** HTML → text extraction (the first step of a C4/RefinedWeb-style
    * web-corpus pipeline): drop script/style/head blocks WITH their
    * contents, drop comments, replace every remaining tag with a
    * space, decode the common named entities, collapse whitespace.
    * A regex extractor, not a DOM parser — boilerplate-block pruning
    * beyond head/script/style is [[graft.ops.Dedup.lineDedup]]'s job
    * downstream, which is exactly where C4 does it.
    *
    * Regexes stay inside the java.util.regex ∩ RE2 intersection
    * (lazy quantifiers, inline (?is) flags, no backrefs) so a SQL
    * oracle re-runs them verbatim; entity decode order puts `&amp;`
    * LAST, so double-encoded entities decode exactly one level
    * (`&amp;lt;` → `&lt;`, the HTML5 reference behavior). Pure
    * map-side regexp/replace chain — one scan, no shuffle. */
  // Explicit whitespace class instead of \s: Java's \s includes \x0B
  // where RE2's does not — the one place the two dialects disagree on
  // these patterns.
  // the ONE explicit ASCII-whitespace class (review r11): Java \s
  // includes \x0B, RE2's does not — any pattern an oracle re-runs
  // must spell the class out or the engines silently disagree on a
  // vertical-tab-bearing document (this was already known here — the
  // class existed — but fingerprint/bpeTokens/punct still used \s)
  private val wsChars = " \\t\\n\\x0B\\f\\r"
  private val wsClass = s"[$wsChars]"

  /** Mojibake repair table: the UTF-8 byte sequences of common
    * non-ASCII characters as they render when mis-decoded as
    * Windows-1252/Latin-1 (the classic double-encoding corruption in
    * web crawls — 'é' stored as UTF-8 0xC3 0xA9 and re-read as "Ã©").
    * Longest-first: the 3-byte punctuation sequences (all starting
    * U+00E2 'â') apply before the 2-byte Latin ones (U+00C3 'Ã' /
    * U+00C2 'Â'), so no entry can corrupt another's input. The list is
    * fixed and public-knowledge (ftfy documents the same mapping);
    * entries whose Windows-1252 rendering is an unmapped control byte
    * (e.g. '”' → 0x9D) are deliberately absent — they don't
    * round-trip as printable text.
    */
  val mojibakeTable: Seq[(String, String)] = Seq(
    // U+2019 ' U+201C " U+2013 – U+2014 — U+2026 …
    "â€™" -> "’", "â€œ" -> "“",
    "â€“" -> "–", "â€”" -> "—",
    "â€¦" -> "…",
    // two-byte Latin-1 supplement letters (0xC3 xx)
    "Ã©" -> "é", "Ã¨" -> "è", // é è
    "Ã¼" -> "ü", "Ã¶" -> "ö", // ü ö
    "Ã¤" -> "ä", "Ã±" -> "ñ", // ä ñ
    "Ã§" -> "ç", "Ã¡" -> "á", // ç á
    "Ã³" -> "ó", "Ãº" -> "ú", // ó ú
    "Ã¯" -> "ï", "ÃŸ" -> "ß", // ï ß
    "Ã " -> "à", // à (0xA0 renders as NBSP)
    // two-byte symbols (0xC2 xx): degree, copyright
    "Â°" -> "°", "Â©" -> "©")

  /** Repair UTF-8-as-Windows-1252 mojibake (the ftfy-style encoding
    * fix every web-crawl pipeline runs before tokenization): a fixed
    * table of corrupted sequences chain-replaced longest-first. Table-
    * driven, not a charset transcoder — a legitimate "Ã©" digram is
    * indistinguishable from corruption by construction, which is why
    * production fixers use exactly this curated-sequence approach.
    * Pure map-side codegen'd replace chain: one scan, no shuffle, and
    * a SQL oracle re-runs the identical chain verbatim. */
  def fixMojibake(text: Column): Column =
    mojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  def stripHtml(html: Column): Column = {
    // Per-tag passes (review r11): the single alternation matched any
    // tag merely STARTING with script/style/head — <header> swallowed
    // body text up to the next closer — and closed at the first closer
    // of ANY of the three, so a <script> inside <head> leaked the rest
    // of the head (title!) into the output. One pass per tag, name
    // anchored with \b (java.regex ∩ RE2), each block closed by its
    // OWN tag; script runs first so script-inside-head is consumed
    // before the head pass sees it.
    val noBlocks = Seq("script", "style", "head").foldLeft(html) { (c, t) =>
      regexp_replace(c,
        lit(s"(?is)<$t\\b[^>]*>.*?</$t$wsClass*>"), lit(" "))
    }
    val noComments = regexp_replace(noBlocks, lit("(?s)<!--.*?-->"), lit(" "))
    val noTags = regexp_replace(noComments, lit("(?s)</?[A-Za-z!][^>]*>"), lit(" "))
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, lit(s"$wsClass+"), lit(" ")))
  }

  /** Markdown → plain text (the source-document twin of [[stripHtml]]
    * for README/docs corpora): fenced code blocks drop WITH contents
    * (boilerplate at corpus scale), inline-code backticks strip
    * keeping the span, images become their alt text and links their
    * anchor text, header/blockquote/list/rule markers strip (ATX and
    * setext), asterisk emphasis and `~~` strikethrough unwrap,
    * whitespace collapses. Underscore emphasis is left ALONE on
    * purpose — `_x_` is indistinguishable from identifiers like
    * `foo_bar_` without a parser, and a wrong strip corrupts
    * code-adjacent text.
    *
    * Ordering is load-bearing: fences before inline code (fence
    * contents must not survive as code spans), images before links
    * (the link pattern would eat `[alt](url)` leaving the `!`).
    * Every regex is in the java.regex ∩ RE2 intersection ((?s)/(?m)
    * inline flags, non-greedy `.*?`, explicit whitespace class), so a
    * DuckDB oracle replays the chain verbatim — Spark replacements
    * write `$1` where DuckDB writes `\1`, the one syntactic
    * difference. Line-END anchors consume an optional \r first
    * (review r12, the C4/Gopher lesson in its java-vs-RE2 form:
    * java's (?m)$ matches before \r\n, RE2's only before \n — a
    * bare $ silently desynchronizes the two engines on CRLF text).
    * Pure map-side, one codegen pass.
    *
    * CODE-SPAN PROTECTION (VERDICT r15 #5, closing review r12's oldest
    * documented trade): kept code-span CONTENT used to be rewritten by
    * the later link/emphasis rules after its backticks stripped
    * (`arr[0](x)` became `arr0`). A regexp chain cannot scope rules
    * outside spans, so [[protectCodeSpans]] runs BETWEEN the fence and
    * marker passes: a native segment-scan fold (split on backticks +
    * `aggregate`, no UDF, no parser dependency) that drops the span
    * backticks and rewrites each marker character inside the span to a
    * private-use sentinel; the sentinels pass through every marker
    * rule untouched and swap back after the whitespace collapse. The
    * scan's open/close/newline semantics replicate a java-regex global
    * replace of `` `([^`\n]*)` `` exactly (the differential fuzz spec
    * pins this against a JDK Matcher loop; the d47/d48 oracles replay
    * it as a linear recursive CTE over the same segments). Sentinel
    * collisions are excluded up front: U+E001-U+E00C strip from the
    * INPUT first (they are private-use codepoints with no legitimate
    * reading in corpus text). In-span whitespace still collapses with
    * the document's — extraction normalization, not rendering.
    *
    * Block markers cap at 3 leading spaces per CommonMark (4+ =
    * indented code) EXCEPT list bullets, where deeper indentation
    * means a NESTED list far more often than code in real READMEs —
    * that one strips at any depth. */
  /** Fence passes — run FIRST (fence contents drop entirely, and their
    * ``` delimiters must never reach the backtick segment scan). One
    * pass per fence delimiter (RE2 has no backreferences, the
    * stripHtml per-tag lesson). */
  private[graft] val mdFenceChain: Seq[(String, String)] = Seq(
    "(?s)(?m)^[ \\t]{0,3}```.*?^[ \\t]{0,3}```[ \\t]*\\r?$" -> " ",
    "(?s)(?m)^[ \\t]{0,3}~~~.*?^[ \\t]{0,3}~~~[ \\t]*\\r?$" -> " ")

  /** Marker passes — run AFTER [[protectCodeSpans]]. ONE copy
    * (package-visible so the differential fuzz spec replays it with
    * driver-side JDK regex against Spark's codegen'd execution; the
    * DuckDB side is replayed verbatim by the d47/d48 oracles). */
  private[graft] val mdMarkerChain: Seq[(String, String)] = Seq(
      // images -> alt text; links -> anchor text (images FIRST)
      "!\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "$1",
      "\\[([^\\]]*)\\]\\(([^)]*)\\)" -> "$1",
      // ATX headers: CommonMark requires whitespace after the hashes
      // ('#42 fixed it' is prose, not a heading — review r12)
      "(?m)^[ \\t]{0,3}#{1,6}[ \\t]+" -> "",
      // setext underlines (the '=====' H1 form; the '---' H2 form is
      // consumed by the horizontal-rule pass below)
      "(?m)^[ \\t]{0,3}=+[ \\t]*\\r?$" -> " ",
      // blockquote markers, horizontal rules
      "(?m)^[ \\t]{0,3}>[ \\t]?" -> "",
      "(?m)^[ \\t]{0,3}([-*_][ \\t]*){3,}\\r?$" -> " ",
      // list bullets / ordered-list markers (any indent — nested
      // lists; see the scaladoc trade-off)
      "(?m)^[ \\t]*([-*+]|[0-9]+[.)])[ \\t]+" -> "",
      // asterisk emphasis + strikethrough unwrap
      "\\*{1,3}([^*\\n]+)\\*{1,3}" -> "$1",
      "~~([^~\\n]+)~~" -> "$1")

  /** In-span marker characters → private-use sentinels. Everything a
    * [[mdMarkerChain]] rule keys on is here; `_` and `!` are excluded
    * on purpose (underscores are never stripped, and `!` only matters
    * glued to a `[` that IS escaped). */
  private[graft] val mdCodeEscapes: Seq[(String, String)] = Seq(
    "[" -> "", "]" -> "", "(" -> "", ")" -> "",
    "*" -> "", "~" -> "", "#" -> "", ">" -> "",
    "-" -> "", "+" -> "", "=" -> "", "." -> "")

  /** The code-span pass: split on backticks, fold the segments with
    * the java-regex scan semantics of `` `([^`\n]*)` `` — a backtick
    * opens a candidate span; the next backtick closes it UNLESS the
    * candidate content carries a newline, in which case the opener
    * was literal and the closer becomes the next candidate opener; an
    * unclosed trailing opener stays literal. Span content survives
    * with its markers sentinel-escaped, backticks drop. All native
    * expressions (split + aggregate + replace) — one pass, no UDF. */
  private[graft] def protectCodeSpans(c: Column): Column = {
    val segs = split(c, "`", -1)
    def esc(s: Column): Column = mdCodeEscapes.foldLeft(s) {
      case (x, (from, to)) => replace(x, lit(from), lit(to))
    }
    aggregate(
      slice(segs, lit(2), greatest(size(segs) - 1, lit(0))),
      struct(element_at(segs, 1).as("acc"), lit(false).as("open"),
        lit("").as("cand")),
      (st, s) => {
        val acc = st.getField("acc")
        val open = st.getField("open")
        val cand = st.getField("cand")
        when(!open, struct(acc.as("acc"), lit(true).as("open"),
          s.as("cand")))
        .when(cand.contains("\n"), struct(
          concat(acc, lit("`"), cand).as("acc"), lit(true).as("open"),
          s.as("cand")))
        .otherwise(struct(concat(acc, esc(cand), s).as("acc"),
          lit(false).as("open"), lit("").as("cand")))
      },
      st => when(st.getField("open"),
        concat(st.getField("acc"), lit("`"), st.getField("cand")))
        .otherwise(st.getField("acc")))
  }

  def stripMarkdown(md: Column): Column = {
    // sentinel collision guard: strip any pre-existing private-use
    // escape codepoints so the final unescape is unambiguous
    val clean = regexp_replace(md, lit("[-]"), lit(""))
    val fenced = mdFenceChain.foldLeft(clean) { case (c, (re, repl)) =>
      regexp_replace(c, lit(re), lit(repl))
    }
    val stripped = mdMarkerChain.foldLeft(protectCodeSpans(fenced)) {
      case (c, (re, repl)) => regexp_replace(c, lit(re), lit(repl))
    }
    val collapsed = trim(regexp_replace(stripped, lit(s"$wsClass+"), lit(" ")))
    mdCodeEscapes.foldLeft(collapsed) { case (c, (from, to)) =>
      replace(c, lit(to), lit(from))
    }
  }
}

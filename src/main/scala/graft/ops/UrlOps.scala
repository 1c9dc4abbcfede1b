package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and domain-blocklist filtering — the first gate of
  * every web-corpus curation run (C4 dropped blocklisted domains
  * before any content filter; RefinedWeb keys its whole pipeline on
  * URL dedup + blocklists).
  *
  * Patterns stay inside java-regex ∩ RE2 syntax so SQL oracles rerun
  * them verbatim. Scale shape: domain extraction is map-side
  * (regexp over the text, no shuffle); the blocklist check explodes
  * (doc, domain) pairs and equi-joins a BROADCAST blocklist — the
  * corpus never shuffles, and blocklists (10^5–10^7 domains) fit the
  * broadcast budget comfortably as single-column frames. */
object UrlOps {

  // Host must END on an alphanumeric (review r9): the greedy '.' in
  // the class swallowed a sentence-final period — 'visit evil.com.'
  // extracted domain 'evil.com.', which silently missed the equi-join
  // against a blocklist entry 'evil.com'. Same rule for the optional
  // path: a trailing '.' stays outside the match.
  // (?i) scheme (review r11): 'HTTP://evil.com' was invisible to the
  // blocklist gate — schemes are case-insensitive per RFC 3986, and
  // (?i) is in the java.regex ∩ RE2 intersection the oracles need.
  val urlRe =
    "(?i:https?)://[A-Za-z0-9.-]*[A-Za-z0-9](?:/[A-Za-z0-9./_-]*[A-Za-z0-9_/-]|/)?"
  private val domainRe = "(?i:https?)://([A-Za-z0-9.-]*[A-Za-z0-9])"

  /** All URLs in a text column (array<string>). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlRe), lit(0))

  /** Hostname of one URL. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, domainRe, 1)

  /** Distinct hostnames referenced by a text column, LOWERCASED
    * (review r11: hostnames are case-insensitive per RFC 4343, and
    * 'Evil.COM' silently missed the blocklist join against
    * 'evil.com' — canonicalizeUrl already lowercases the host). */
  def domains(text: Column): Column =
    array_distinct(transform(extractUrls(text), u => lower(urlDomain(u))))

  /** Canonical URL form for URL-keyed dedup — the FIRST step of a
    * RefinedWeb-style pipeline (its whole dedup keys on the URL before
    * any content processing): fragment stripped, scheme+host
    * lowercased (paths stay case-sensitive), default ports dropped,
    * tracking parameters (utm_*, fbclid, gclid) removed with
    * query-string cleanup, one trailing slash trimmed. Pure map-side
    * regexp/replace chain in the java.regex ∩ RE2 intersection; the
    * replacement group SYNTAX differs per engine ($1 vs \1) but the
    * substitutions are identical, so a SQL oracle reproduces the
    * canonical form verbatim. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, lit("#.*"), lit(""))
    val prefixRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered = concat(
      lower(regexp_extract(noFrag, prefixRe, 0)),
      regexp_replace(noFrag, lit(prefixRe), lit("")))
    val noPort = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lowered,
            lit("^(https://[^/:?#]*):443([/?#])"), lit("$1$2")),
          lit("^(http://[^/:?#]*):80([/?#])"), lit("$1$2")),
        lit("^(https://[^/:?#]*):443$"), lit("$1")),
      lit("^(http://[^/:?#]*):80$"), lit("$1"))
    val noTrack = regexp_replace(noPort,
      lit("([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"), lit("$1"))
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(noTrack, lit("\\?&+"), lit("?")),
        lit("&&+"), lit("&")),
      lit("[?&]+$"), lit(""))
    // a path-final slash is noise both at end-of-string and before
    // the query string
    regexp_replace(
      regexp_replace(cleaned, lit("([^/])/[?]"), lit("$1?")),
      lit("([^/])/$"), lit("$1"))
  }

  /** URL-keyed exact dedup (RefinedWeb rule: one document per
    * canonical URL, min-id keeper): canonicalize, then ONE
    * digest-keyed aggregation — the shuffle moves (canonical-url
    * hash, id) pairs, never documents. Documents with a null/missing
    * URL are NOT copies of each other: they pass through as singleton
    * groups (keep_id = own id, n_copies = 1), so applying the keep
    * set never drops a URL-less document (review r10 — previously all
    * null URLs hashed to one group and all but one would be culled).
    * "Missing" includes blank: an empty or whitespace-only url column
    * canonicalizes to a non-null '' that would otherwise collapse every
    * URL-less doc into one group — the same silent-loss class as nulls
    * (ADVICE r10), so blanks take the singleton branch too. Blank
    * means ANY Unicode whitespace (review r11: Spark's trim() strips
    * only ASCII 0x20, so a tab/newline/NBSP-only url was still
    * grouped — rlike over \s + \p{Z} covers what scraped corpora
    * actually write into empty url fields). */
  def dedupByUrl(docs: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val curled = docs.select(col(idCol),
      canonicalizeUrl(col(urlCol)).as("__curl"))
    val blank = col("__curl").isNull || col("__curl").rlike("^[\\s\\p{Z}]*$")
    curled.filter(!blank)
      .groupBy(md5(col("__curl").cast("binary")).as("__h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .unionByName(curled.filter(blank)
        .select(col(idCol).as("keep_id"), lit(1L).as("n_copies")))
  }

  /** Drop every document referencing at least one blocklisted domain.
    * `blocklist` is a one-column (`domain`) frame; it broadcasts, the
    * hit set is (doc id)s only, and the final anti-join is narrow. */
  def filterByBlocklist(docs: DataFrame, blocklist: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bl = blocklist.select(lower(col("domain")).as("__bl")).distinct()
    val hits = docs.select(col(idCol),
        explode(domains(col(textCol))).as("domain"))
      .join(broadcast(bl), blockMatch(col("domain"), col("__bl")))
      .select(col(idCol)).distinct()
    docs.join(hits, Seq(idCol), "left_anti")
  }

  /** Blocklist hit rule (review r11): exact host OR any subdomain —
    * blocklists carry registrable domains ('evil.com'), and an exact
    * equi-join let every www/m/cdn subdomain walk straight through.
    * The broadcast side stays tiny, so the OR-condition join is a
    * broadcast nested loop over |domains per doc| × |blocklist| —
    * map-side, corpus never shuffles. */
  private def blockMatch(domain: Column, blocked: Column): Column =
    domain === blocked || domain.endsWith(concat(lit("."), blocked))

  /** Per-document URL audit: url count, distinct domains, and whether
    * any domain is blocklisted (1/0) — the flag form of
    * [[filterByBlocklist]] for pipelines that quarantine rather than
    * drop. */
  def auditUrls(docs: DataFrame, blocklist: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // ONE pass over the corpus: materialize the URL array in a single
    // projection so size() and the domain explode share it inside one
    // codegen stage (review r9: computing extractUrls separately in
    // the Project and the Generate ran the dominant regexp scan twice
    // — whole-stage CSE cannot span physical operators). explode_outer
    // keeps url-free docs; the blocklist is distinct()d first: a
    // duplicated blocklist row would fan out the left join and inflate
    // n_domains (ADVICE r5).
    docs.select(col(idCol), extractUrls(col(textCol)).as("__urls"))
      .select(col(idCol),
        // null text extracts a null array; report 0 urls, not the
        // -1/null sentinel size() yields (review r11)
        coalesce(size(col("__urls")), lit(0)).as("n_urls"),
        explode_outer(array_distinct(
          transform(col("__urls"), u => lower(urlDomain(u))))).as("domain"))
      .join(broadcast(blocklist.select(lower(col("domain")).as("__bl"))
          .distinct().withColumn("__hit", lit(1))),
        blockMatch(col("domain"), col("__bl")), "left_outer")
      .groupBy(col(idCol))
      // countDistinct, not count (review r11): the subdomain rule can
      // match one domain against several blocklist rows, and the
      // left-join fanout would inflate the domain count
      .agg(first(col("n_urls")).as("n_urls"),
        countDistinct(col("domain")).as("n_domains_l"),
        max(coalesce(col("__hit"), lit(0))).as("blocked"))
      .select(col(idCol), col("n_urls"),
        col("n_domains_l").cast("int").as("n_domains"), col("blocked"))
}

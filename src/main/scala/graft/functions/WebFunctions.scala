package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl curation primitives: HTML → text extraction (the raw-crawl →
  * training-text stage every web corpus pipeline starts with — CCNet,
  * RefinedWeb, FineWeb all begin here) and URL canonicalization (the key
  * normalization that makes URL-level dedup and per-domain caps mean what
  * they say).
  *
  * Everything here is a codegen'd column-expression chain —
  * `regexp_replace` / `regexp_extract` / `aggregate`, no UDFs — so the
  * whole extraction stage rides whole-stage codegen inside the corpus
  * scan, and filters composed on top of the outputs still push down.
  * The regex subset used (inline `(?is)` flags, non-greedy `.*?`, `\b`,
  * character classes — NO backreferences, and whitespace spelled as the
  * explicit RE2 set [[TextFunctions.Ws]] rather than `\s`, whose Java
  * form additionally matches U+000B) is chosen to mean the same thing in
  * Java regex and RE2, so the DuckDB oracles run the literal same
  * patterns.
  *
  * Scale notes: one pass over the HTML column per op; the chain is a
  * fixed number of linear scans of each value (no quadratic regex — every
  * pattern is prefix-anchored or single-pass non-greedy). At 100 TB the
  * extraction cost is the read cost; nothing here shuffles.
  */
object WebFunctions {

  // ------------------------------------------------------------------
  // HTML → text
  // ------------------------------------------------------------------

  /** Strip `<script>` and `<style>` blocks INCLUDING their contents
    * (their text is code, not prose — and script bodies legally contain
    * bare `<` that would corrupt a naive tag strip). Case-insensitive,
    * dot-matches-newline, non-greedy to the matching close tag. */
  def stripScriptStyle(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
  }

  /** Strip HTML comments (`<!-- ... -->`), dot-matches-newline. */
  def stripComments(html: Column): Column =
    regexp_replace(html, "(?s)<!--.*?-->", " ")

  /** Decode the common HTML entities. Order is part of the contract:
    * the named/numeric entities decode FIRST and `&amp;` LAST, so a
    * double-escaped `&amp;lt;` correctly becomes the literal text
    * `&lt;` (not `<`). Entities outside this set (e.g. `&copy;`) pass
    * through untouched — deterministic, and a later pass can extend the
    * table without changing existing behavior. */
  def decodeEntities(text: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
  }

  /** Full HTML → clean text chain: comments out FIRST (a commented-out
    * `<script>` opener would otherwise pair with a later real close tag
    * and swallow the page body between them — browsers treat `<!--` as
    * comment-ish inside scripts too, so comments-first is the
    * convergent order), then script/style blocks, then tags (each tag
    * becomes a space, so adjacent block elements don't concatenate
    * words), entities decoded, whitespace collapsed, trimmed. One
    * linear scan per step, all inside codegen. */
  def htmlToText(html: Column): Column = {
    val noTags = regexp_replace(stripScriptStyle(stripComments(html)),
      "<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), TextFunctions.WsPlus, " "))
  }

  /** `<title>` contents (first occurrence), entity-decoded and trimmed;
    * empty string when absent. */
  def htmlTitle(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, "(?is)<title>(.*?)</title>", 1)))

  /** Count of anchor (`<a …>`) opening tags. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\b"), lit(0)))

  /** Total characters of anchor-enclosed text (the numerator of link
    * density). Nested markup inside an anchor counts as written — the
    * boilerplate signal cares about how much of the page is inside
    * links, not about the anchors' inner structure. */
  def anchorTextChars(html: Column): Column =
    aggregate(
      regexp_extract_all(html, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(x))

  /** Link density in integer basis points of 1e-4 (anchor chars *
    * 10000 div extracted-text chars; 0 for empty text) — the classic
    * boilerplate-page signal (nav/footer/link-farm pages score high),
    * integer-exact so it hash-oracles. Takes the ALREADY-EXTRACTED
    * clean text as a second column so callers materialize the
    * extraction chain once — an html-only form would re-expand the full
    * [[htmlToText]] regexp chain inside this expression (Catalyst does
    * not CSE across independent top-level expressions). */
  def linkDensityE4(html: Column, cleanText: Column): Column = {
    val textLen = length(cleanText)
    when(textLen <= 0, lit(0L))
      .otherwise((anchorTextChars(html).cast("long") * 10000L /
        textLen.cast("long")).cast("long"))
    // positive operands: double-division truncation == integer div
  }

  // ------------------------------------------------------------------
  // URL canonicalization
  // ------------------------------------------------------------------

  private val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val restPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
  private val trackingAlt = "(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"

  /** Canonicalize an absolute http(s)-style URL:
    *
    *   - scheme and host lowercased (they are case-insensitive per RFC
    *     3986; the path is NOT touched — it is case-sensitive),
    *   - leading `www.` dropped from the host,
    *   - default ports stripped (`:80` for http, `:443` for https),
    *   - the fragment dropped (never sent to the server),
    *   - tracking query parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref`), with separator tidy-up (`?&`→`?`, trailing `?`/`&`
    *     dropped),
    *   - empty path normalized to `/`.
    *
    * Strings without a `scheme://` prefix pass through UNCHANGED — this
    * is a normalizer for absolute URLs, not a resolver; relative
    * references need a base URL the column doesn't carry. The whole op
    * is a fixed regexp chain (same RE2/Java-compatible subset as the
    * HTML ops), so URL-level exact dedup after canonicalization is
    * hash-groupBy on this column's output. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemePat, 1))
    val hostRaw = regexp_replace(
      lower(regexp_extract(url, hostPat, 1)), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val rest0 = regexp_extract(url, restPat, 1)
    // split path from query at the FIRST '?' before touching anything:
    // tracking-param removal runs ONLY on the query substring — a legal
    // literal '&ref=' or '&gclid=' inside the PATH (http://h/p&ref=x?q=1)
    // must survive, honoring the "path is NOT touched" contract above
    val path = regexp_extract(rest0, "^([^?]*)", 1)
    val query0 = regexp_extract(rest0, "\\?.*", 0)
    // order matters and is part of the contract (mirrored in oracles):
    // &-separated tracking params first, then a ?-led leading one, then
    // separator tidy-up
    val query1 = regexp_replace(query0, "(?i)&" + trackingAlt, "")
    val query2 = regexp_replace(query1, "(?i)\\?" + trackingAlt, "?")
    val query3 =
      regexp_replace(regexp_replace(query2, "\\?&", "?"), "[?&]$", "")
    val rest3 = concat(path, query3)
    val rest = when(rest3 === "", lit("/")).otherwise(rest3)
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** Registered host of a canonicalized URL (everything between `://`
    * and the first `/`, `?` or `#`) — the grouping key for per-domain
    * caps and host-graph edges. */
  def hostOf(url: Column): Column =
    regexp_extract(url, hostPat, 1)

  /** Drop rows whose host column matches a blocklist — the
    * opt-out/abuse-domain filter every crawl pipeline applies after
    * canonicalization. Blocklists are list-shaped (thousands to low
    * millions of hosts — curated, not crawled), so this is a broadcast
    * LEFT ANTI hash join: one corpus scan, nothing shuffles, and a
    * blocklist update re-runs only this stage. Matching is exact on the
    * canonicalized host — run [[canonicalizeUrl]]/[[hostOf]] first so
    * `WWW.Bad.COM:443` and `bad.com` are the same key. */
  def dropBlockedHosts(docs: org.apache.spark.sql.DataFrame,
      blocklist: org.apache.spark.sql.DataFrame,
      hostCol: String = "host"): org.apache.spark.sql.DataFrame =
    docs.join(
      broadcast(blocklist.select(col(hostCol)).distinct()),
      Seq(hostCol), "left_anti")
}

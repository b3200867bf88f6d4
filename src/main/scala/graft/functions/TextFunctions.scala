package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting.
  *
  * All pure column expressions (codegen'd, no UDFs) so they stay inside
  * WholeStageCodegen and scale linearly with the scan — at 100 TB these run
  * as a narrow map over the documents table with zero shuffles.
  */
object TextFunctions {

  /** Whitespace, spelled as the explicit RE2 `\s` set `[\t\n\f\r ]`.
    * Java's `\s` additionally matches U+000B (vertical tab); RE2's does
    * not, and the DuckDB oracles run RE2 — so every engine-side
    * whitespace regex uses this explicit class and the oracles keep
    * their literal `\s`, making both engines split/collapse identically
    * even on documents containing U+000B. */
  val Ws = "[ \\t\\n\\f\\r]"
  /** One-or-more [[Ws]] — the tokenizer delimiter / collapse pattern. */
  val WsPlus: String = Ws + "+"
  /** Complement of [[Ws]] (RE2 `\S`). */
  val NonWs = "[^ \\t\\n\\f\\r]"

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(text, WsPlus))

  /** Word tokens (whitespace split). */
  def tokens(text: Column): Column = split(text, WsPlus)

  /** BPE-ish sub-word unit count: one unit per maximal alphanumeric run
    * plus one per non-space punctuation character — a cheap, deterministic
    * proxy for tokenizer cost accounting. RE2-expressible (no lookahead),
    * so external engines reproduce it exactly. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text,
      lit("[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]")).cast("long")

  /** Count of non-overlapping occurrences of `needle` in `text` via the
    * split identity `len(split(text, needle)) - 1` — expressible in any SQL
    * dialect with identical left-to-right non-overlap semantics (used for
    * oracle parity). */
  def occurrences(text: Column, needle: String): Column =
    (size(split(text, java.util.regex.Pattern.quote(needle), -1)) - 1).cast("long")

  /** Stopword-hit ratio of a language given its marker words: fraction of
    * tokens that are in the marker set. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = stopwords.map(w =>
      size(filter(toks, t => t === w)).cast("double")).reduce(_ + _)
    hits / size(toks).cast("double")
  }

  /** Language-ID marker sets — tiny n-gram/stopword heuristic. Real
    * pipelines plug fasttext-style models here; the engine contract is the
    * column shape, which stays identical. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "a"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "et", "la", "les"),
    "es" -> Seq("el", "y", "la", "los"),
    "zh" -> Seq("的", "和", "是", "了"))

  /** Heuristic language-ID: argmax over marker-hit counts; zero-hit rows
    * → "und" (undetermined); ties break to the alphabetically-first
    * language (the oracle mirrors the same CASE order). Pure CASE chain. */
  def langId(text: Column): Column = {
    val counts = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> words.map(w => occurrences(concat(lit(" "), text, lit(" ")), s" $w ")).reduce(_ + _)
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, cnt), acc) =>
      when(cnt === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Punctuation-character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", "")))
      .cast("double") / length(text).cast("double")

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double")
  }

  /** Document quality score in [0,1] — length, punctuation and
    * stopword-density heuristics blended, the standard pre-training filter
    * shape (C4/Gopher-style rules). Deterministic and SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / lit(50.0), lit(1.0)) // saturate at 50 tokens
    val punct = punctRatio(text)
    // continuous 1 → 0 over punct ∈ [0, 0.2] (previous form multiplied
    // by 5.0 * 0.2 = 1, leaving a 0.8 → 0 cliff at the threshold)
    val punctScore = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct * 5.0)
    val stopScore = least(stopwordRatio(text, langMarkers("en")) * lit(5.0), lit(1.0))
    round(lightWeight(lengthScore, punctScore, stopScore), 6)
  }

  private def lightWeight(l: Column, p: Column, s: Column): Column =
    l * 0.5 + p * 0.3 + s * 0.2

  /** Polynomial rolling-hash fingerprint of the document text (mod 2^61-1,
    * base 257 over UTF-8 bytes) — content-addressed document identity for
    * exact dedup across shards without carrying the full text through the
    * shuffle. Runs as a native Catalyst expression via crc32/md5 composition:
    * we use the first 16 hex chars of md5 as a 64-bit fingerprint (md5 is
    * codegen'd and available in every SQL engine for oracle parity). */
  /** Gopher-style repetition signal: fraction of tokens that are repeats
    * of an earlier token — (n − distinct)/n. High values flag boilerplate
    * / degenerate documents in training-data quality filters. */
  def duplicateTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n === 0, lit(0.0)).otherwise(
      (n - size(array_distinct(toks))).cast("double") / n.cast("double"))
  }

  /** Gopher-style repetition signal: the most frequent word bigram's share
    * of all bigrams. Pure array expressions, no shuffle.
    *
    * Shape matters here: the naive `transform(sequence(1, n-1), i ->
    * element_at(toks, i)...)` + `filter`-count form re-embeds the split
    * subtree inside every lambda invocation — O(tokens³) regex work per
    * document (each element_at re-tokenizes, each distinct-bigram count
    * re-builds the bigram list). This form is O(n log n): bigrams via
    * zip_with over two slices (constant splits per row), then the mode
    * count is the longest equal-adjacent run of the SORTED bigram array,
    * folded in one `aggregate` pass that evaluates its input exactly
    * once. */
  def topBigramFraction(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val sorted = array_sort(bigrams)
    // adjacent-equality flags of the sorted list; max run = mode count − 1
    val flags = zip_with(
      slice(sorted, lit(1), size(sorted) - 1),
      slice(sorted, lit(2), size(sorted) - 1),
      (a, b) => when(a === b, 1).otherwise(0))
    val maxRun = aggregate(flags,
      struct(lit(0).as("cur"), lit(0).as("best")),
      (acc, x) => {
        val cur = when(x === 1, acc.getField("cur") + 1).otherwise(lit(0))
        struct(cur.as("cur"),
          greatest(acc.getField("best"), cur).as("best"))
      },
      acc => acc.getField("best") + 1)
    when(n < 2, lit(0.0)).otherwise(
      maxRun.cast("double") / (n - 1).cast("double"))
  }

  /** Character-distribution entropy in integer 1e-4-bit units — the
    * gibberish/repetition quality signal: random byte soup scores near
    * log2(alphabet), degenerate repetition scores near 0, natural text
    * sits in a stable band between them. Runs as the native codegen
    * [[CharEntropyE4]] expression (one pass over code points); the
    * interpreted fold form below ([[charEntropyE4Fold]]) is kept as the
    * independently-derived reference the spec proves value-identical. */
  def charEntropyE4(text: Column): Column =
    GraftFunctions.char_entropy_e4(text)

  /** Column-function form of [[charEntropyE4]]: H = log2(n) −
    * (Σ_runs c·log2 c)/n over the SORTED character array, run lengths
    * folded in one `aggregate` pass (the [[topBigramFraction]] shape —
    * input evaluated once, no nested lambda capturing an outer array).
    * The `+ 1e-6` floor nudge covers the exact-uniform cases where H is
    * a power-of-2 log (the [[graft.pipeline.LangModel]] discipline).
    * Interpreted (HOFs skip codegen) — the native expression is ~8×
    * faster on the corpus scan; this form stays as the cross-check. */
  def charEntropyE4Fold(text: Column): Column = {
    val chars = array_sort(split(text, ""))
    val n = size(chars)
    def closeRun(run: Column): Column =
      when(run === 0L, lit(0.0))
        .otherwise(run.cast("double") * log2(run.cast("double")))
    val folded = aggregate(chars,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("s")),
      (acc, x) => {
        val same = x === acc.getField("prev")
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          (acc.getField("s") + when(same, lit(0.0))
            .otherwise(closeRun(acc.getField("run")))).as("s"))
      },
      acc => acc.getField("s") + closeRun(acc.getField("run")))
    val h = log2(n.cast("double")) - folded / n.cast("double")
    when(n === 0, lit(0L))
      .otherwise(floor(h * lit(10000.0) + lit(1e-6)).cast("long"))
  }

  /** Gopher-style quality rule battery (Rae et al. 2021 §A1.1 shape):
    * explicit per-rule booleans plus the conjunction, emitted per doc so
    * downstream can audit WHICH rule dropped a document (production
    * pipelines track per-rule drop rates — a sudden shift flags corpus
    * drift). All arithmetic is integer/ratio exact, so external engines
    * re-derive every verdict bit-for-bit; thresholds parameterized with
    * corpus-calibrated defaults. */
  def gopherRules(text: Column, minTokens: Long = 25L,
      maxTokens: Long = 100000L, minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0, maxDupFrac: Double = 0.55,
      maxTopBigram: Double = 0.125, maxPunct: Double = 0.2): Column =
    GraftFunctions.gopher_rules(text, minTokens, maxTokens, minMeanLen,
      maxMeanLen, maxDupFrac, maxTopBigram, maxPunct, langMarkers("en"))

  /** The original column-function battery — each signal a declarative
    * array/HOF expression. Kept as the independently-derived reference
    * the fused [[graft.functions.GopherRules]] kernel is spec-proven
    * bit-identical to (CorpusOpsSpec); the kernel serves the corpus
    * scans because the HOF folds here skip whole-stage codegen and
    * re-derive the token array once per signal. */
  def gopherRulesDeclarative(text: Column, minTokens: Long = 25L,
      maxTokens: Long = 100000L, minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0, maxDupFrac: Double = 0.55,
      maxTopBigram: Double = 0.125, maxPunct: Double = 0.2): Column = {
    val n = tokenCount(text).cast("long")
    val lenOk = n >= minTokens && n <= maxTokens
    val meanOk = meanTokenLen(text).between(minMeanLen, maxMeanLen)
    val dupOk = duplicateTokenFraction(text) <= maxDupFrac
    val bigramOk = topBigramFraction(text) <= maxTopBigram
    val punctOk = punctRatio(text) <= maxPunct
    val stopOk = langMarkers("en")
      .map(w => occurrences(concat(lit(" "), text, lit(" ")), s" $w "))
      .reduce(_ + _) >= 1
    struct(
      lenOk.as("len_ok"), meanOk.as("mean_len_ok"), dupOk.as("dup_ok"),
      bigramOk.as("bigram_ok"), punctOk.as("punct_ok"),
      stopOk.as("stop_ok"),
      (lenOk && meanOk && dupOk && bigramOk && punctOk && stopOk).as("keep"))
  }

  /** Dedup-grade text normalization: punctuation → space, whitespace
    * runs collapsed, trimmed, lowercased. Exact dedup over the normalized
    * form catches the near-identical variants (spacing/punctuation/case
    * jitter) that raw content hashing misses — the standard normalize-
    * before-hash stage of web-scale dedup. Pure codegen'd string
    * expressions; the oracle mirrors each step with the same regexes. */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", " "), WsPlus, " ")))

  def fingerprint64(text: Column): Column =
    conv(substring(md5(text.cast("binary")), 1, 16), 16, 10).cast("decimal(20,0)")

  /** Hex md5 fingerprint (full). */
  def fingerprintHex(text: Column): Column = md5(text.cast("binary"))

  // ---- PII scrub — the redaction stage a web-scale training pipeline
  // runs before packing (emails / IPv4 addresses / phone numbers →
  // placeholder tokens). Patterns are deliberately RE2-expressible (no
  // lookahead, no backrefs) so external engines — and the DuckDB oracle —
  // reproduce the scrub byte-for-byte. Pure codegen'd regexp_replace
  // chain: runs inside the scan at 100 TB, no UDF. ----

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2} \\(\\d{3}\\) \\d{3}-\\d{4}"

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, phone numbers →
    * `<PHONE>`. Email runs first so an address's host part is never
    * half-eaten by the IP pass. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-kind PII hit counts (pre-scrub), for redaction audit stats. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_emails"),
    regexp_count(text, lit(PhoneRe)).as("n_phones"),
    regexp_count(text, lit(Ipv4Re)).as("n_ips"))

  // ---- URL / domain analysis — web-corpus pipelines group, weight, and
  // dedup BY DOMAIN (per-domain quotas, blocklists, provenance stats).
  // RE2-safe patterns, same cross-engine-parity discipline as the scrub.

  val UrlRe = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9._%/-]*)?"

  /** All http(s) URLs in a document, in order. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Registrable-ish domain of a URL: host, lowercased, `www.` stripped
    * (the grouping key of per-domain corpus stats). */
  def domainOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "https?://([A-Za-z0-9.-]+)", 1)),
      "^www\\.", "")
}

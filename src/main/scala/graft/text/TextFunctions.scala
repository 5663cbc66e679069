package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines, built from
  * codegen'd `functions._` array/string expressions (no UDFs on the hot
  * path — every helper here stays inside whole-stage codegen).
  *
  * All hashes are md5-derived so a DuckDB oracle can reproduce them
  * exactly: h(s) = int(md5(s)[0:15 hex]) — 60 bits, always positive.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens.
    *
    * KNOWN ORACLE SCOPE: `lower()` uses Java's full Unicode case mapping
    * while DuckDB's uses utf8proc's simple mapping; they diverge on
    * full-case-mapping characters (e.g. 'İ' U+0130 → "i"+U+0307 in Java,
    * "i" in DuckDB). Every text oracle in this repo (tokens, shingles,
    * fingerprints, BPE counts, TF-IDF) therefore holds exactly for
    * ASCII-cased corpora — which the fixtures are; a non-ASCII corpus
    * needs an ASCII-only fold (translate A-Z→a-z) on BOTH engines. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenizer pattern: the GPT-family pre-tokenization
    * shape (letter runs / digit runs / punctuation runs, each absorbing
    * one leading space, plus residual whitespace) restricted to
    * RE2-compatible syntax — no lookaheads — so a DuckDB oracle
    * reproduces the count exactly. */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

  /** LLM token-budget proxy: number of BPE-style pre-tokens. Real BPE
    * merges only ever split pre-tokens further, so this lower-bounds the
    * true token count with the right scaling behavior — and stays a pure
    * codegen'd expression (no tokenizer library on executors). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** Cross-engine deterministic 60-bit token hash. */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of [[md5Hash64]] — bit-identical to the column
    * expression (first 15 hex digits of the UTF-8 md5, parsed base 16),
    * for hashing bounded query sets against executor-built sketches. */
  def md5Hash64Jvm(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  /** Tracking query parameters every public crawl pipeline strips
    * before URL-level dedup (C4/RefinedWeb/FineWeb discipline):
    * the utm_* family plus the big ad-click identifiers. */
  val TrackingParamPattern = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"

  /** Canonical URL — the key URL-level dedup groups by. Pure codegen'd
    * string expressions (RE2-compatible regexes, no lookarounds), so a
    * DuckDB oracle replicates every rule verbatim. Rules, in order:
    *
    *  1. trim surrounding whitespace; strip the `#fragment`;
    *  2. lowercase the scheme and the host (ASCII fold — the same
    *     collation caveat as [[tokens]]); path/query case is preserved
    *     (paths are case-sensitive on most origins);
    *  3. drop the default port (`:80` for http, `:443` for https);
    *     non-default ports survive;
    *  4. drop tracking parameters ([[TrackingParamPattern]]) and empty
    *     `&&` fragments, SORT the surviving `key=value` params
    *     byte-lexically (param order is transport noise), drop the `?`
    *     when nothing survives;
    *  5. normalize an empty path to `/` and strip one trailing slash
    *     from longer paths (`/a/b/` ≡ `/a/b`).
    *
    * A non-URL string passes through these rules unharmed (no scheme →
    * rules 2–3 no-op on the empty extract) — garbage in, stable
    * garbage out, never an exception at 10⁹-rows scale. */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?]*)", 1)
    val host = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keptPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val pathQuery = regexp_replace(afterScheme, "^[^/?]*", "")
    val path = regexp_extract(pathQuery, "^([^?]*)", 1)
    val qstr = regexp_extract(pathQuery, "[?](.*)", 1)
    val params = filter(split(qstr, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamPattern))
    val query = array_join(array_sort(params), "&")
    val normPath = when(path === "", "/")
      .when(path =!= "/" && path.endsWith("/"),
        path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    concat(scheme, lit("://"), host, keptPort, normPath,
      when(query === "", "").otherwise(concat(lit("?"), query)))
  }

  /** Modulus keeping rolling-hash arithmetic inside 2^36 (ANSI-safe). */
  val HashMod = 2147483647L // 2^31 − 1

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * the token stream, `fp = Σ fp·31 + h(tok) (mod 2^31−1)`. Detects
    * exact token-sequence duplicates regardless of whitespace/punct. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => pmod(md5Hash64(t), lit(HashMod))),
      lit(0L),
      (acc, x) => (acc * 31L + x) % HashMod)

  /** Distinct word n-gram shingles; a document shorter than n tokens
    * contributes its whole token stream as one shingle.
    *
    * Declarative form — semantically the reference shape for the DuckDB
    * oracle. For hot paths use [[shinglesFast]]: the expression tree here
    * allocates one slice array per position (measured 4.3s/pass on 5000
    * docs vs 0.5s for the single-pass UDF). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Single-pass sliding-window shingling (same result as [[shingles]]:
    * distinct, first-occurrence order, whole-stream fallback under n). */
  def shinglesFast(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toks: Seq[String]) =>
      if (toks.length < n) Seq(toks.mkString(" "))
      else {
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        val sb = new StringBuilder
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks(i + k))
            k += 1
          }
          seen += sb.toString
          i += 1
        }
        seen.toSeq
      }
    }

  // --- language identification (stopword-profile heuristic) ---

  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with", "was", "are"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est", "dans", "que", "pour", "avec", "sur", "pas", "ce"),
    "es" -> Seq("el", "los", "las", "y", "es", "en", "que", "por", "con", "para", "del", "una", "no", "se"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu", "von", "auf", "den", "im"))

  def markerHits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(typedLit(Markers(lang)), t)))

  /** Fraction of CJK codepoints — the zh/ja/ko signal that word markers
    * cannot carry (no whitespace tokenization). */
  def cjkRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Heuristic language id: 'zh' on CJK density, else argmax of
    * stopword-marker hits (ties broken en > fr > es > de), 'und' when no
    * marker fires. Pure column expression — runs inside codegen at any
    * scale. */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** [[langId]] over pre-split tokens. Spark's subexpression elimination
    * skips higher-order functions, so every `tokens(text)` subtree in a
    * projection is a separate regex split per row; queries computing
    * several token-based features should materialize the token array
    * ONCE (a non-cheap aliased column blocks projection collapse) and
    * use the *FromTokens variants — measured 4× on the lang+quality
    * query. */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    val s = Map(
      "en" -> markerHits(toks, "en"), "fr" -> markerHits(toks, "fr"),
      "es" -> markerHits(toks, "es"), "de" -> markerHits(toks, "de"))
    when(cjkRatio(text) > lit(0.15), lit("zh"))
      .when(s("en") >= s("fr") && s("en") >= s("es") && s("en") >= s("de") && s("en") > 0, lit("en"))
      .when(s("fr") >= s("es") && s("fr") >= s("de") && s("fr") > 0, lit("fr"))
      .when(s("es") >= s("de") && s("es") > 0, lit("es"))
      .when(s("de") > 0, lit("de"))
      .otherwise(lit("und"))
  }

  // --- quality scoring ---

  /** Fraction of [a-z0-9 ] chars after lowercasing (penalizes markup,
    * control chars, encoding garbage). */
  def alnumRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Type-token ratio (vocabulary diversity; boilerplate repeats). */
  def distinctTokenRatio(text: Column): Column =
    distinctTokenRatioFromTokens(tokens(text))

  def distinctTokenRatioFromTokens(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** English stopword ratio — natural prose sits near ~0.4; 0 or ≫0.6
    * signals keyword lists / boilerplate. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioFromTokens(tokens(text))

  def stopwordRatioFromTokens(toks: Column): Column =
    markerHits(toks, "en").cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** Composite quality score in [0,1]:
    * 0.3·min(nTokens/50, 1) + 0.3·TTR + 0.2·alnumRatio + 0.2·stopFit
    * where stopFit = 1 − |stopRatio − 0.35|/0.35 clamped to [0,1].
    * The weights are a documented editorial choice, not learned. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    val stopFit = greatest(
      lit(0.0), lit(1.0) - abs(stopwordRatioFromTokens(toks) - lit(0.35)) / lit(0.35))
    lit(0.3) * lenScore + lit(0.3) * distinctTokenRatioFromTokens(toks) +
      lit(0.2) * alnumRatio(text) + lit(0.2) * stopFit
  }

  /** Within-document repetition: 1 − (distinct trigrams / total trigrams)
    * over the token stream — the Gopher-style boilerplate signal. 0.0 for
    * documents under 3 tokens (no trigram exists) and for null text (a
    * null WHEN condition falls through to the otherwise branch on both
    * engines). Uses the single-pass [[shinglesFast]] UDF for the distinct
    * count; total count is just size−2, so no second pass. */
  def repetitionScoreFromTokens(toks: Column): Column =
    when(size(toks) >= 3,
      lit(1.0) - size(shinglesFast(3)(toks)).cast("double") / (size(toks) - 2))
      .otherwise(lit(0.0))

  /** PII patterns, RE2-compatible (no lookarounds, no backrefs) so the
    * DuckDB oracle runs the SAME regex: email addresses and phone-shaped
    * digit runs (an international-prefix-optional digit sequence of ≥8
    * with optional (), -, space separators — deliberately conservative;
    * redaction prefers false positives over leaked PII). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** PII redaction — emails first (their local parts contain digits that
    * would otherwise feed the phone pattern), then phones. Pure codegen'd
    * projection: the scrub pass over a 100 TB corpus is a map, nothing
    * else. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")
}

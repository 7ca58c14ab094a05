package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality stats, marker-based language ID, bag fingerprints
  * and SimHash — all pure Catalyst expressions (higher-order array functions,
  * no UDFs, no shuffles), so a 100 TB corpus pays only a codegen'd projection
  * per document.
  *
  * Functions take the text column NAME (they splice it into SQL lambda
  * expressions, where a bare Column can't be captured).
  *
  * Beyond-parity module (SURVEY.md §7.5): the reference pipeline
  * (geo-temporal ETL) has no text surface; these operators extend the engine
  * toward LLM-corpus preparation.
  */
object TextFunctions {

  /** SQL fragment: whitespace-collapsed, trimmed text. */
  private def normSql(c: String) = s"regexp_replace(trim(`$c`), '\\\\s+', ' ')"

  /** SQL fragment: whitespace tokens of the normalized text. */
  private[graft] def toksSql(c: String) = s"split(${normSql(c)}, ' ')"

  /** Whitespace-collapsed, trimmed text (normalization shared by every op). */
  def normText(c: String): Column = expr(normSql(c))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: String): Column = expr(toksSql(c))

  /** Common English function words used by the quality score. Public
    * knowledge; any stopword list can be substituted. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private def inList(t: String, values: Seq[String]): String =
    values.map(v => s"'$v'").mkString(s"$t IN (", ", ", ")")

  /** The raw (unrounded) per-document signal columns shared by
    * [[textStats]] and [[qualityFilter]] — ONE definition per signal, so a
    * tokenizer or regex change cannot desynchronize the two surfaces (and
    * their oracle mirrors). */
  private final case class RawStats(
      nTokens: Column, nTypes: Column, ttr: Column,
      avgLen: Column, punct: Column, stopRatio: Column)

  private def rawStats(c: String): RawStats = {
    val norm = normText(c)
    val toks = tokens(c)
    val nTokens = size(toks)
    val nTypes = size(array_distinct(toks))
    val ttr = nTypes.cast("double") / nTokens
    // single-space separated => total token chars = len(norm) - (n-1)
    val avgLen = (length(norm) - (nTokens - lit(1))).cast("double") / nTokens
    val punct =
      (length(norm) - length(regexp_replace(norm, "[^a-zA-Z0-9 ]", ""))).cast("double") /
        length(norm)
    val stopCount = size(expr(s"filter(${toksSql(c)}, t -> ${inList("t", Stopwords)})"))
    RawStats(nTokens, nTypes, ttr, avgLen, punct, stopCount.cast("double") / nTokens)
  }

  /** n tokens / distinct tokens / type-token ratio / average token length /
    * punctuation ratio / stopword ratio / composite quality score, as a
    * struct column. One pass, fully codegen'd. */
  def textStats(c: String): Column = {
    val s = rawStats(c)
    // Deterministic composite: length saturation x lexical diversity x cleanliness.
    val quality =
      least(lit(1.0), s.nTokens.cast("double") / 50.0) * s.ttr * (lit(1.0) - s.punct)
    struct(
      s.nTokens.as("n_tokens"),
      s.nTypes.as("n_types"),
      round(s.ttr, 4).as("ttr"),
      round(s.avgLen, 4).as("avg_token_len"),
      round(s.punct, 4).as("punct_ratio"),
      round(s.stopRatio, 4).as("stopword_ratio"),
      round(quality, 4).as("quality_score")
    )
  }

  /** Gopher-style composite quality gate: per-document boolean rules over
    * the one-pass text stats, plus the conjunction as `keep`. All arithmetic
    * is the unrounded ratio (rounding before a threshold compare would make
    * the boundary engine-dependent). Default thresholds follow the published
    * Gopher/C4 heuristics scaled to short documents; every threshold is a
    * parameter because curation pipelines always re-tune them per corpus.
    * One codegen'd projection — no shuffle, no UDF. */
  def qualityFilter(
      c: String,
      minTokens: Int = 20,
      maxTokens: Int = 80,
      minTtr: Double = 0.4,
      minStopRatio: Double = 0.05,
      maxPunctRatio: Double = 0.1,
      minAvgTokenLen: Double = 3.0,
      maxAvgTokenLen: Double = 6.0): Column = {
    val s = rawStats(c)
    val rLen = s.nTokens >= minTokens && s.nTokens <= maxTokens
    val rTtr = s.ttr >= minTtr
    val rStop = s.stopRatio >= minStopRatio
    val rPunct = s.punct <= maxPunctRatio
    val rAvgLen = s.avgLen >= minAvgTokenLen && s.avgLen <= maxAvgTokenLen
    struct(
      s.nTokens.as("n_tokens"),
      rLen.as("r_len"),
      rTtr.as("r_ttr"),
      rStop.as("r_stop"),
      rPunct.as("r_punct"),
      rAvgLen.as("r_avg_len"),
      (rLen && rTtr && rStop && rPunct && rAvgLen).as("keep")
    )
  }

  /** DEFLATE-compressed length of the text's UTF-8 bytes — delegates to
    * the native codegen'd [[DeflateLen]] expression. Registered on the
    * ACTIVE session (a Column function has no handle on the frame's own);
    * multi-session JVMs must call `GraftExtensions.register` on the
    * session that analyzes the plan. */
  def deflateLen(c: String): Column = deflateLen(col(c))

  /** Column overload of [[deflateLen]] for derived inputs (e.g. the
    * doubled-text LZ77 witness in the t16 battery entry). */
  def deflateLen(c: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("deflate_len", c)
  }

  /** Mojibake repair (native [[FixMojibake]]): unwind cp1252-misdecoded
    * UTF-8 ("cafÃ©" → "café", the double-encoded "Ã¢â‚¬â„¢" apostrophe →
    * "’") to a bounded fixpoint; strings that are not a cp1252 image of
    * valid UTF-8 — including genuinely-Latin-1 text — pass through
    * unchanged. The standard curation-pipeline text hygiene step next to
    * the native `nfc_normalize`. */
  def fixMojibake(c: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("fix_mojibake", c)
  }

  /** Checksum-validated credit-card scrubbing (native [[LuhnScrub]]):
    * 13-19 digit runs (single space/dash separators allowed) are masked
    * as `<CC>` only when they pass the Luhn mod-10 check, so phone
    * numbers, order ids, and timestamps survive while well-formed PANs
    * never leak. Compose with [[scrubPii]] for the full hygiene pass. */
  def luhnScrub(c: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("luhn_scrub", c)
  }

  /** `inflate(deflate(text)) == text` witness (native [[DeflateRoundtrip]]).
    * The oracle-adjudicable form of the compression signal: DuckDB can't
    * mirror raw-DEFLATE lengths but CAN assert this boolean is universally
    * true. */
  def deflateRoundtrip(c: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("deflate_roundtrip", c)
  }

  /** Compression-ratio quality signal: `deflate_len / byte_len`, rounded
    * to 4 decimals. Template/boilerplate spam compresses far below natural
    * prose and random noise barely compresses, so one scan flags both
    * tails (the RefinedWeb-style curation heuristic). Null for empty
    * text. */
  def compressionRatio(c: String): Column = {
    val n = octet_length(col(c))
    round(when(n > 0, deflateLen(c).cast("double") / n), 4)
  }

  /** Unicode script ranges for [[scriptProfile]] — explicit BMP
    * code-point ranges, NOT engine script tables, so Spark and any SQL
    * mirror count the exact same characters. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "cjk" -> "[一-鿿]",
    "arabic" -> "[؀-ۿ]")

  /** Script-mix profile — the multilingual curation signal next to
    * [[langId]]: per-script character counts (explicit code-point
    * ranges) plus the dominant script, ties broken by [[ScriptRanges]]
    * order. Returns struct(n_latin, n_cyrillic, n_greek, n_cjk,
    * n_arabic, n_digit, dominant), computed by the native
    * [[ScriptProfile]] expression — one UTF-8 decode pass per row
    * instead of [[scriptProfileRegexp]]'s six regexp scans. */
  def scriptProfile(c: String): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("script_profile", col(c))
  }

  /** The regexp formulation [[scriptProfile]] replaced, kept as the
    * equivalence-test witness (QualityOpsSpec asserts bit-parity on
    * both codegen paths): counting is `length(x) -
    * length(regexp_replace(x, range, ''))` per range — correct, but six
    * full string scans and six transient stripped copies per row where
    * the native expression decodes each code point once. */
  def scriptProfileRegexp(c: String): Column = {
    def count(range: String): Column =
      (length(col(c)) - length(regexp_replace(col(c), range, ""))).cast("int")
    val counts = ScriptRanges.map { case (name, range) => name -> count(range) }
    val dominant = counts.zipWithIndex.foldRight(
      lit(ScriptRanges.last._1): Column) { case (((name, cnt), i), rest) =>
      val laterMax = counts.drop(i + 1).map(_._2)
      if (laterMax.isEmpty) rest
      else {
        val others =
          if (laterMax.size == 1) laterMax.head else greatest(laterMax: _*)
        when(cnt >= others, name).otherwise(rest)
      }
    }
    struct(
      (counts.map { case (n, cc) => cc.as(s"n_$n") } :+
        count("[0-9]").as("n_digit") :+
        dominant.as("dominant")): _*)
  }

  /** Function-word markers per language (public-knowledge closed-class
    * words); the language whose markers appear most often wins. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "en" -> Seq("the", "is", "of", "and", "a"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "了", "是", "在", "我")
  )

  /** Marker-count n-gram heuristic language ID. Returns a struct with one
    * `score_<lang>` per language plus the argmax `predicted` (ties broken by
    * language code ascending; all-zero defaults to the first code). */
  def langId(c: String): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(expr(s"filter(${toksSql(c)}, t -> ${inList("t", markers)})"))
    }
    // argmax with lexicographic tie-break: fold over langs in order, strictly
    // greater score replaces — first (alphabetically) max wins.
    val (firstLang, firstScore) = scores.head
    val (predicted, _) = scores.tail.foldLeft((lit(firstLang), firstScore)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }
    struct(
      scores.map { case (l, s) => s.as(s"score_$l") } :+ predicted.as("predicted"): _*)
  }

  /** GPT-2-style pretokenizer pattern, ASCII-simplified and
    * lookaround-free so the Java and RE2/DuckDB regex dialects agree:
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, residual whitespace. Counting matches of this
    * pattern approximates a BPE tokenizer's pre-merge token count — the
    * standard cheap LLM-budget estimator (real BPE merges only reduce it). */
  val BpeTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** BPE-ish token count: matches of [[BpeTokenPattern]] (regex scanning
    * skips unmatched whitespace between tokens). Pure codegen'd
    * regexp_count — scan speed. */
  def bpeTokenCount(c: String): Column =
    regexp_count(col(c), lit(BpeTokenPattern))

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct token
    * list. Two documents with the same vocabulary collide regardless of word
    * order — a cheap first-stage near-dup key. */
  def bagFingerprint(c: String): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  /** Fixed-size overlapping token chunks — the embedding-pipeline
    * precursor (long documents split into encoder-window pieces before
    * vectorization). Returns array<struct<chunk_id, toks>> where chunk k
    * covers tokens [k*(size-overlap), k*(size-overlap)+size); the last
    * chunk may be shorter, and every token is covered.
    *
    * Pure per-row expression: the token array is BOUND once (transform
    * over a one-element array) so the document is tokenized once, not
    * once per chunk — then each chunk is an O(size) slice. No explode
    * here; callers explode when they want one row per chunk. */
  def chunks(c: String, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    expr(
      s"""flatten(transform(array(${toksSql(c)}), ts ->
         |  transform(sequence(0, size(ts) - 1, $stride), s ->
         |    struct(CAST(s div $stride AS INT) AS chunk_id,
         |           slice(ts, s + 1, $size) AS toks))))""".stripMargin)
  }

  /** PII scrub patterns (kept lookaround-free so the Java and RE2 regex
    * dialects agree): emails, URLs, simple dashed phone numbers. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3,6}\\b"

  /** Redact emails/URLs/phone numbers — the standard corpus-preparation
    * scrub, as three chained codegen'd regexp_replace passes. */
  def scrubPii(c: String): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(col(c), UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Number of SimHash bits (60 = 15 md5 nibbles, keeping the accumulated
    * value positive in a signed 64-bit long). */
  val SimHashBits = 60

  /** 60-bit SimHash of the token multiset, as a non-negative long.
    *
    * Per token, bit j (0-based) is nibble `j/4` of `md5(token)` probed at
    * position `3 - j%4`; the document bit is 1 when strictly more than half
    * the tokens have it set. Delegates to the native codegen'd
    * [[SimHash60]] expression (registered on the active session) — the
    * lambda formulation ([[simHashLambda]]) was the engine's last
    * interpreted hot path. Per-row work only, no explode, no shuffle.
    */
  def simHash(c: String): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    expr(s"simhash60(${toksSql(c)})")
  }

  /** The portable higher-order-lambda formulation of [[simHash]] — same
    * math on the interpreted HOF path. Kept as the equivalence-test witness
    * for [[SimHash60]] and as the engine-portable form (plain SQL, runs on
    * any engine with md5 + array lambdas). The md5 base hash is chosen for
    * exactly that portability (any salted 64-bit hash works).
    */
  def simHashLambda(c: String): Column = {
    // bits(h): array<int> of the 60 bit values probed from md5 hex h.
    // BINDING DISCIPLINE (the engine-wide higher-order rule): interpreted
    // lambdas re-evaluate unbound subexpressions per element, so md5 must
    // hash each token ONCE (the fold runs over pre-hashed hex strings, not
    // tokens — previously md5(t) ran per BIT, 60x per token) and the token
    // array binds once via the one-element-array transform so size(ts) is
    // an O(1) probe instead of a per-bit re-tokenization. Measured: 60x
    // fewer md5 calls; the capped d9 band join dropped 14.7 s -> 6.1 s.
    val bits =
      s"""transform(sequence(0, ${SimHashBits - 1}), j ->
         |  shiftright(instr('0123456789abcdef', substring(h, (j div 4) + 1, 1)) - 1,
         |             3 - (j % 4)) & 1)""".stripMargin
    expr(
      s"""element_at(transform(array(${toksSql(c)}), ts ->
         |  aggregate(
         |    zip_with(
         |      aggregate(transform(ts, t -> md5(t)),
         |                array_repeat(CAST(0 AS BIGINT), ${SimHashBits}),
         |                (acc, h) -> zip_with(acc, $bits, (a, b) -> a + CAST(b AS BIGINT))),
         |      sequence(0, ${SimHashBits - 1}),
         |      (ones, j) -> IF(2 * ones > size(ts), shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
         |    CAST(0 AS BIGINT), (s, v) -> s + v)), 1)""".stripMargin)
  }

  /** Query parameters stripped by [[canonicalUrl]]: the click-tracking
    * keys (plus the `utm_*` prefix family) that make one page surface as
    * millions of distinct crawl URLs. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** URL canonicalization — the crawl-curation normalizer run before any
    * URL-keyed dedup or host-level rollup: lowercase scheme and host
    * (trailing host dot stripped), default ports dropped (http:80 /
    * https:443 — explicit non-defaults kept), empty path normalized to
    * `/`, the fragment dropped, and the query rewritten with tracking
    * parameters removed and the survivors byte-sorted (parameter order is
    * not page identity). Null/unparseable inputs yield null.
    *
    * Entirely codegen'd column ops (parse_url + array lambdas) — per-row
    * work, no shuffle; pair with [[Dedup.exactDedup]] on the canonical
    * form for crawl URL-dedup. */
  def canonicalUrl(u: Column): Column = {
    def part(p: String): Column = call_function("parse_url", u, lit(p))
    val scheme = lower(part("PROTOCOL"))
    val host = regexp_replace(lower(part("HOST")), "\\.$", "")
    // an IPv6 literal's own trailing ':1' must not read as a port: when
    // the host is bracketed, a real port can only follow the ']'
    val auth = part("AUTHORITY")
    val port = when(host.startsWith("["),
        regexp_extract(auth, "\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(auth, ":([0-9]+)$", 1))
    val defPort = when(scheme === "http", lit("80"))
      .when(scheme === "https", lit("443")).otherwise(lit(""))
    val portPart = when(port === "" || port === defPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = coalesce(part("PATH"), lit(""))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // a tracking key matches bare ('?fbclid') or valued ('?fbclid=x'),
    // mirroring the utm_ prefix rule — requiring '=' would let the bare
    // form survive and split otherwise-identical URLs
    val params = filter(split(coalesce(part("QUERY"), lit("")), "&"),
      p => p =!= "" && !p.startsWith("utm_") &&
        TrackingParams.map(t => p =!= t && !p.startsWith(t + "=")).reduce(_ && _))
    val q = array_join(array_sort(params), "&")
    val qPart = when(q === "", lit("")).otherwise(concat(lit("?"), q))
    when(scheme.isNull || host.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** The canonical URL's host — the key of crawl-curation host-level
    * rollups (per-host doc counts, quality means, robots policies). */
  def urlHost(u: Column): Column =
    regexp_replace(lower(call_function("parse_url", u, lit("HOST"))), "\\.$", "")

  /** Jaro-Winkler name similarity — the record-linkage scorer that
    * rewards shared prefixes where Levenshtein only counts edits; the
    * native codegen'd [[JaroWinklerSim]] expression (classic convention:
    * p = 0.1, 4-char prefix cap, 0.7 boost threshold). Per-row work. */
  def jaroWinkler(a: Column, b: Column): Column = {
    graft.plans.GraftExtensions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("jaro_winkler", a, b)
  }

  // ---- HTML extraction (crawl corpora arrive as markup, not text) --------

  /** Markup removal only — comments, then whole script/style elements
    * (content and all), then every remaining tag, each replaced by one
    * space so adjacent text never fuses. Patterns avoid backreferences
    * deliberately: RE2 engines (the oracle's) reject them, Java's accepts
    * them — per-element alternatives keep the chain portable AND
    * single-pass per element kind. Pure regexp_replace chain: codegen'd,
    * no UDF, scan-speed. */
  def htmlStripTags(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    regexp_replace(noStyle, "(?s)<[^>]+>", " ")
  }

  /** The five named entities every extractor must fold plus the numeric
    * apostrophe; `&amp;` is decoded LAST (the standard order — decoding
    * it first would double-decode `&amp;lt;`). */
  def htmlDecodeEntities(text: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** Visible text of an HTML document: strip markup, decode entities,
    * collapse whitespace. The t48 battery entry pins this chain against
    * an independent RE2 re-implementation over synthesized HTML. */
  def htmlText(html: Column): Column =
    trim(regexp_replace(htmlDecodeEntities(htmlStripTags(html)), "\\s+", " "))

  /** Anchor-text link density — the classic boilerplate signal
    * (navigation/chrome is link-dense, body prose is not): chars of
    * visible text inside `<a>` elements over total visible chars.
    * Documents that clear ~0.5 are overwhelmingly boilerplate. */
  def htmlLinkDensity(html: Column): Column = {
    val linkInner = array_join(
      regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a\\s*>"), lit(1)), " ")
    val linkChars = length(htmlText(linkInner))
    val totalChars = length(htmlText(html))
    round(linkChars.cast("double") / greatest(totalChars, lit(1)), 4)
  }

  /** Text-to-markup ratio — the other boilerplate axis: how much of the
    * raw document is actual prose. Low ratios mean tag soup / chrome. */
  def htmlTextRatio(html: Column): Column =
    round(length(htmlText(html)).cast("double") /
      greatest(length(html), lit(1)), 4)
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundDet

/** Text-analysis operators for LLM training-data pipelines.
  *
  * All operators are pure Catalyst expression trees (no UDFs) so they stay
  * inside whole-stage codegen and scale linearly with input splits — at
  * 100 TB these run as a single map stage over the parquet scan with zero
  * shuffle.
  */
object TextAnalysis {

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single punctuation. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Per-document statistics: char/token counts, average token length,
    * stopword ratio. One projection, no shuffle.
    */
  def textStats(df: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val nTokens = size(toks).cast("long")
    // native CountInSet: the HOF filter+isin tree is CodegenFallback and
    // pays an interpreted lambda call per token
    val nStop = graft.expr.native.countInSet(toks, stopwords)
    df.withColumn("char_count", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        roundDet((length(col(textCol)) - (nTokens - 1)).cast("double") / nTokens, 4))
      .withColumn("stopword_ratio",
        roundDet(nStop.cast("double") / nTokens, 4))
  }

  /** Quality score in [0,1]: favors documents that are long enough and not
    * stopword-soup; the shape (bounded length term × content term) follows
    * the usual C4/Gopher-style heuristics.
    */
  def qualityScore(nTokens: Column, stopwordRatio: Column): Column =
    roundDet(least(nTokens.cast("double") / 100.0, lit(1.0)) *
      (lit(1.0) - stopwordRatio), 4)

  /** Language-marker profiles: tiny per-language stopword sets. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "un"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** N-gram-heuristic language ID: score = #tokens matching each language's
    * marker set; argmax with deterministic tie-break; "und" when no marker
    * hits. Pure expressions — a codegen'd map over the scan.
    */
  def langId(text: Column): Column =
    graft.expr.native.langId(tokens(lower(text)), LangProfiles)

  /** Document fingerprint: md5 over the sorted distinct token set — a
    * canonical bag-of-words signature (word-order-insensitive), the cheap
    * first stage before MinHash in a dedup cascade.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Polynomial rolling hash over tokens (order-sensitive), base 31 mod
    * 2^64 via Horner's rule — the classic Rabin-Karp document signature.
    * Native single-pass expression (the HOF `aggregate` form pays an
    * interpreted lambda per token); same xxhash64(seed 42) per-token hash,
    * so signatures are unchanged.
    */
  def rollingHash(text: Column): Column =
    graft.expr.native.rollingHash64(tokens(text))

  /** DEFLATE compression ratio (compressed bytes / raw UTF-8 bytes,
    * empty → 1.0): the compressibility quality signal — boilerplate,
    * template spam, and looped n-grams compress far better than fluent
    * prose, so a LOW ratio flags degenerate documents (complements
    * [[repetitionRatio]], which only sees exact token repeats; deflate
    * also catches long-range and sub-token repetition). Native
    * codegen'd expression, one thread-local zlib stream — the 100 TB
    * path is scan → ratio → filter, no shuffle.
    */
  def compressionRatio(text: Column): Column =
    graft.expr.native.deflateRatio(text)

  /** Within-document repetition: fraction of tokens that are repeats of
    * an earlier token (Gopher-style repetition signal — high values mean
    * keyword-stuffing / boilerplate loops). Pure expressions, no shuffle.
    */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(text)
    roundDet(lit(1.0) -
      size(array_distinct(toks)).cast("double") / size(toks), 4)
  }

  // Regexes stay inside the Java∩RE2 common subset so the same pattern
  // is reproducible in DuckDB/BigQuery oracles (no backrefs, no
  // lookaround).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9][0-9() -]{6,}[0-9]"
  val UrlRe = "https?://[^ ]+"

  /** PII scrub: emails, IPv4 addresses, and international-format phone
    * numbers replaced with typed placeholder tags. Email first (an
    * address contains digit runs the other patterns could half-match).
    * One codegen'd projection — the 100 TB path is scan → redact → write.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** All http(s) URLs in a document, as array<string>. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Registrable-host extraction for a URL string. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "https?://([^/ ]+)", 1)

  /** Canonical domain for a URL: lowercased host with a leading `www.`
    * stripped — the key for host-level crawl statistics and URL-level
    * dedup. Pure expressions (Java∩RE2 regex subset).
    */
  def urlDomain(url: Column): Column =
    regexp_replace(lower(urlHost(url)), "^www\\.", "")

  /** Query parameters dropped by [[canonicalizeUrl]]: tracking noise that
    * varies per click while addressing the same resource. Shared with the
    * DuckDB oracle regex (Java∩RE2 subset) — the terminator is `\z`
    * (end of TEXT in both engines), not `$`, which Java alone lets match
    * before a trailing newline. Bare `ref` is deliberately NOT in the
    * list: on many sites it is a functional routing parameter
    * (`?ref=main` selecting content), and dropping it would collapse
    * distinct pages — only the unambiguous tracker families are safe.
    */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|mc_cid|mc_eid)(=|\\z)"

  /** URL canonicalization for crawl dedup: two spellings of one resource
    * must hash identically before URL-level dedup, or the crawl admits
    * every tracking-tagged variant as a distinct page. Applied rules
    * (the conservative, semantics-preserving subset):
    *   - scheme and host lowercased (path/query case is significant and
    *     kept),
    *   - default ports stripped (`:80` for http, `:443` for https),
    *   - fragment dropped (never sent to the server),
    *   - empty path becomes `/`,
    *   - tracking parameters ([[TrackingParamRe]]) dropped and the
    *     remaining query parameters sorted byte-wise (`a=1&b=2` ≡
    *     `b=2&a=1`); an emptied query drops its `?`.
    * Pure expression tree over one projection — the 100 TB path is
    * scan → canonicalize → hash-dedup, no shuffle before the dedup key.
    * The parameter filter is a HOF lambda (CodegenFallback) over the
    * handful of `&`-split slices per URL — interpreted cost is bounded
    * by URL length, not document length.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // userinfo (case-SENSITIVE per RFC 3986 — credentials) split off the
    // authority before the host is lowercased; greedy up-to-last-@, since
    // a host cannot contain '@'
    val userinfo =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*@)", 1)
    val hostRaw = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80\\z", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443\\z", ""))
      .otherwise(hostRaw)
    val pathRaw =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    // query = first '?' (not the last — [^#?]* cannot skip one) up to
    // the fragment; a '?' inside the query stays part of it
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(TrackingParamRe))
    val canonQ = array_join(array_sort(kept), "&")
    // a string with no scheme://host prefix is not a URL this grammar
    // covers — pass it through unchanged rather than emitting "://"
    // + fragments of the input as a fabricated key
    when(scheme === "" || hostRaw === "", url)
      .otherwise(concat(scheme, lit("://"), userinfo, host, path,
        when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ))))
  }

  /** Per-domain frequency cap: keep at most `cap` documents per domain,
    * selected by a deterministic salted-md5 priority — the
    * over-represented-domain control a crawl pipeline applies before
    * mixing (a handful of template-heavy hosts otherwise dominate the
    * token budget). Priority is a pure function of the id, so the kept
    * set is identical across runs, engines, and crawl re-processings.
    * Runs on the bounded top-k aggregate ([[graft.operators.TopK]]):
    * O(cap) partial state per (task, domain) — no window sort, no
    * single-reducer funnel even when one domain holds half the crawl.
    * Returns the kept (domainCol, idCol) pairs; semi-join to apply.
    */
  def capPerDomain(df: org.apache.spark.sql.DataFrame, cap: Int,
      domainCol: String = "domain",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val pri = conv(substring(
      md5(concat_ws(":", lit("domaincap"), col(idCol).cast("string"))),
      25, 8), 16, 10).cast("long")
    graft.operators.TopK.grouped(
      df.select(col(domainCol), col(idCol)).withColumn("_pri", pri),
      domainCol, "_pri", idCol, cap)
      .select(col(domainCol), col(idCol))
  }

  /** Unicode NFC canonicalization (native codegen'd expression): run
    * FIRST in any normalize→hash chain so composed/decomposed variants
    * of the same text fingerprint identically. See
    * [[graft.expr.NfcNormalize]] for the cross-engine contract.
    */
  def nfcNormalize(text: Column): Column =
    graft.expr.native.nfcNormalize(text)

  /** Canonical text normalization for normalized-form dedup: lowercase,
    * strip everything but letters/digits/spaces (Unicode categories, so
    * non-Latin scripts survive), collapse whitespace runs, trim. The
    * \\p{L}\\p{N} classes are in the Java∩RE2 common subset, so the same
    * pattern reproduces in DuckDB/BigQuery oracles. One codegen'd
    * projection — the 100 TB path is scan → normalize → hash.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", " "),
      " +", " "))

  /** HTML → text extraction — the first transform a crawl pipeline runs
    * (the trafilatura/jusText step, reduced to its deterministic core):
    * drop <script>/<style> subtrees wholesale (their text is code, not
    * prose), strip the remaining tags, decode the five core entities,
    * collapse whitespace. Every pattern sits in the Java∩RE2 regex
    * subset ((?s) dot-matches-newline, non-greedy .*?, no backrefs), so
    * DuckDB recomputes the extraction byte-for-byte — and the whole
    * chain is ONE codegen'd projection: at 100 TB this is scan → map,
    * zero shuffles, pruned to the html column.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST: "&amp;lt;" must yield "&lt;", not "<"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // explicit class, not \s: Java's \s includes \x0B (vertical tab) but
    // RE2's does not — the one pattern in this chain where the dialects
    // diverge, so spell out the exact set on both sides
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  /** The high-frequency UTF-8-read-as-Latin-1/cp1252 double-encoding
    * sequences and their true characters — the ftfy fast path. Every
    * LHS is a printable Unicode literal (the cp1252 rendering of the
    * mojibake bytes), so the identical replace chain reproduces in any
    * engine; sequences whose cp1252 rendering contains a C1 control
    * char (e.g. the right double quote) are deliberately excluded. */
  private[graft] val MojibakeMap: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ãª" -> "ê", "Ã¼" -> "ü", "Ã±" -> "ñ",
    "Ã§" -> "ç", "Ã¶" -> "ö", "Ã¤" -> "ä",
    "â€™" -> "’", "â€œ" -> "“", "â€¦" -> "…")

  private val mojibakePattern = MojibakeMap.map(_._1).mkString("|")

  /** Count of mojibake sequences in `text` — the encoding-damage score
    * a crawl pipeline thresholds on. Literal alternation (no classes),
    * identical under Java and RE2 regex semantics; regexp_count counts
    * non-overlapping matches without materializing the match array
    * (the DuckDB twin's len(regexp_extract_all(...)) is the same
    * count). */
  def mojibakeHits(text: Column): Column =
    regexp_count(text, lit(mojibakePattern)).cast("long")

  /** Repair double-encoded text by the table above: each sequence maps
    * back to the character whose UTF-8 bytes were mis-decoded. A
    * no-op on clean text, so it applies unconditionally — ONE native
    * single-scan projection ([[graft.expr.ReplaceMany]]: clean text
    * returns untouched after a lead-char probe; damaged text pays one
    * rebuild instead of the 11 chained `replace` rewrites), scan → map
    * at 100 TB (the general charset roundtrip needs a decoder with
    * error-action control, which Spark 4 surfaces as errors rather
    * than U+FFFD; the table covers the sequences that dominate real
    * crawls and stays expression-only). Equivalence to the replace
    * chain — including idempotence — is pinned in PropertySpec. */
  def repairMojibake(text: Column): Column =
    graft.expr.native.replaceMany(text, MojibakeMap)

  /** Boilerplate detector: word n-grams occurring in more than
    * `minDocs` distinct documents (headers/footers/licenses in a crawl).
    * One explode + one count shuffle; feed the result to a filter or to
    * [[graft.llm.Dedup.ngramJaccardPairs]]'s maxDocFreq cap.
    */
  def repeatedNgrams(df: org.apache.spark.sql.DataFrame, n: Int = 3,
      minDocs: Long = 2L, textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    df.select(explode(Dedup.shingles(tokens(col(textCol)), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Duplicate-n-gram character fraction (Gopher §A1.2 / RefinedWeb's
    * repetition signals): the fraction of the document's characters
    * accounted for by n-gram occurrences whose n-gram repeats within
    * the document, capped at 1 (occurrences overlap). Complements
    * [[repetitionRatio]] (distinct-token level) with phrase-level
    * repetition — template/boilerplate spam repeats n-grams long before
    * it exhausts its vocabulary.
    *
    * Shape: repetition is WITHIN a document, so the whole signal is
    * ONE native per-row pass ([[graft.expr.DupKgramChars]]: k-gram
    * chain hashes → occurrence counts → duplicate char mass) — scan →
    * map, zero shuffles. This replaces the positioned string-gram
    * explode plus two corpus-wide aggregations (an exchange keyed on
    * (doc, gram-string), then one on doc) the first version paid: the
    * per-(doc, gram) counts never needed to leave their row. Gram
    * identity is the 64-bit STATISTICS hash convention
    * (TokenKgramHashes) — an intra-doc collision perturbs one count.
    * 100 TB-embarrassingly-parallel.
    */
  def dupNgramCharFrac(df: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1)
    df.withColumn("_toks", tokens(col(textCol)))
      .filter(size(col("_toks")) >= n)
      .select(col(idCol),
        roundDet(least(lit(1.0),
          graft.expr.native.dupKgramChars(col("_toks"), n).cast("double") /
            length(col(textCol)).cast("double")), 4)
          .as("dup_ngram_char_frac"))
  }

  /** Gopher-rules stop set (Rae et al. 2021 §A1.1: "the, be, to, of,
    * and, that, have, with" — a document must contain ≥ 2 of them).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-filter signals + verdict (Rae et al. 2021, §A1.1 —
    * the public rule set every large-scale text pipeline reimplements):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * ('#' and '…'/'...'), fraction of words containing an alphabetic
    * character, and stop-word presence. Pure codegen'd expressions —
    * a map over the scan, embarrassingly 100 TB-parallel. Emits each
    * signal (auditable: a data card wants the WHY, not just the bit)
    * plus the composite `gopher_pass`.
    */
  def gopherFlags(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    val nD = n.cast("double")
    def occurrences(needle: String, len: Int) =
      ((length(col(textCol)) -
        length(regexp_replace(col(textCol), lit(java.util.regex.Pattern
          .quote(needle)), lit("")))) / len).cast("long")
    val nSymbols = occurrences("#", 1) + occurrences("...", 3) +
      occurrences("…", 1)
    val nAlphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStopHits = size(filter(
      array(GopherStopwords.map(lit): _*),
      s => array_contains(toks, s))).cast("long")
    df.withColumn("n_words", n)
      .withColumn("mean_word_len",
        roundDet((length(col(textCol)) - (n - 1)).cast("double") / nD, 4))
      .withColumn("symbol_ratio", roundDet(nSymbols.cast("double") / nD, 4))
      .withColumn("alpha_word_frac", roundDet(nAlphaWords.cast("double") / nD, 4))
      .withColumn("n_stop_hits", nStopHits)
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("alpha_word_frac") >= 0.8 &&
          col("n_stop_hits") >= 2)
  }
}

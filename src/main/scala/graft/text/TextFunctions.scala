package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, token counting, language-ID, quality scoring and document
  * fingerprinting — all as composed native `functions._` expressions so the
  * whole pipeline stays inside whole-stage codegen (no UDFs, no Python).
  *
  * At 100 TB these are pure narrow projections over the document scan: no
  * shuffle, columnar parquet input, and Catalyst prunes to the `text` column.
  */
object TextFunctions {

  /** Whitespace tokenization (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** BPE-ish subword split: letter runs, digit runs, and each remaining
    * non-space symbol — a cheap deterministic proxy for a real tokenizer's
    * token count. Deliberately RE2-safe (no lookarounds): the same pattern
    * runs verbatim in engines like DuckDB, so the count is oracle-checkable
    * end to end. */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(lower(trim(text)),
      lit("""\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"""), lit(0))

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Per-language marker words for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Evaluate `f` over the tokenization bound ONCE per row: higher-order
    * functions are interpreted with no common-subexpression elimination, so
    * an expression referencing `tokens(text)` from inside a lambda (or just
    * several times) re-runs the regex split at every reference — the
    * single-element `transform` turns each reference into an O(1) lambda-
    * slot read (same trick and measurement as [[graft.dedup.DocDedup
    * .shingles]]; ~10 re-tokenizations per row in the language/quality
    * gates before). `f`'s result must be castable into one column. */
  private def withTokens(text: Column)(f: Column => Column): Column =
    element_at(transform(array(tokens(text)), f), 1)

  /** Count of `toks` members that appear in `words`. */
  private def markerHitsOf(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Count of tokens that appear in `words`. */
  def markerHits(text: Column, words: Seq[String]): Column =
    markerHitsOf(tokens(text), words)

  /** Language-ID: argmax of marker-word hits, deterministic tie-break by
    * language code order; "und" when nothing matches. One tokenization per
    * row (bound through [[withTokens]]) feeding all languages' counts. */
  def langId(text: Column): Column = withTokens(text) { toks =>
    // greatest hits wins; on ties the earlier langMarkers entry wins
    // (greatest() keeps the later element on full struct ties, so embed the
    // inverse rank to make the tie-break explicit):
    val ranked = langMarkers.zipWithIndex.map { case ((code, words), i) =>
      struct(
        markerHitsOf(toks, words).as("hits"),
        lit(langMarkers.size - i).as("prio"),
        lit(code).as("code"))
    }
    val best = greatest(ranked: _*)
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise((n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / n.cast("double"))
  }

  /** `tokenCount` over bound tokens (the empty-text guard needs `text`). */
  private def tokenCountOf(text: Column, toks: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(toks))

  /** Stopword-token ratio (English stopword list). */
  def stopwordRatio(text: Column): Column = withTokens(text) { toks =>
    stopwordRatioOf(text, toks)
  }

  private def stopwordRatioOf(text: Column, toks: Column): Column = {
    val stop = langMarkers.toMap.apply("en")
    val n = tokenCountOf(text, toks)
    when(n === 0, lit(0.0))
      .otherwise(markerHitsOf(toks, stop).cast("double") / n.cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = withTokens(text) { toks =>
    meanTokenLenOf(text, toks)
  }

  private def meanTokenLenOf(text: Column, toks: Column): Column = {
    val n = tokenCountOf(text, toks)
    when(n === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / n.cast("double"))
  }

  /** Composite quality score in [0,1]: length band + low punctuation +
    * reasonable mean word length + some stopwords (the classic cheap
    * pre-filters a pretraining pipeline applies before dedup). One
    * tokenization per row feeds the word and stopword bands. */
  def qualityScore(text: Column): Column = withTokens(text) { toks =>
    val lenOk = when(length(text).between(100, 20000), lit(0.4)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.2)).otherwise(lit(0.0))
    val wordOk = when(meanTokenLenOf(text, toks).between(2.0, 12.0), lit(0.2))
      .otherwise(lit(0.0))
    val stopOk = when(stopwordRatioOf(text, toks) > 0.01, lit(0.2)).otherwise(lit(0.0))
    lenOk + punctOk + wordOk + stopOk
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** HTML → text extraction (the WET step a crawl pipeline runs between
    * WARC ingestion and every text gate): drop script/style subtrees
    * wholesale (their CONTENT is not prose — a tag-only strip would leak
    * JavaScript into the corpus), strip the remaining tags, decode the
    * five core character entities, and collapse whitespace. A pure
    * codegen'd regexp_replace/replace chain — no UDF — and every step is
    * RE2-safe ((?s) dotall, no lookarounds), so the DuckDB oracle
    * replays the identical chain. */
  def htmlExtract(html: Column): Column =
    cleanFragment(regexp_replace(dropSubtrees(html), lit("<[^>]*>"), lit(" ")))

  /** script/style subtree drop — the shared head of [[htmlExtract]] and
    * [[htmlBlocks]] (their CONTENT must vanish wholesale before any
    * tag-level work). */
  private def dropSubtrees(html: Column): Column = {
    val noScript = regexp_replace(html,
      lit("(?s)<script[^>]*>.*?</script>"), lit(" "))
    regexp_replace(noScript, lit("(?s)<style[^>]*>.*?</style>"), lit(" "))
  }

  /** Entity decode + whitespace collapse over an already-tag-free
    * fragment. Entity order matters: &amp; LAST, or re-escaped text
    * double-decodes. Explicit whitespace class, not \s: Java's \s
    * includes \x0B, RE2's does not — the one divergence that would
    * hash-mismatch across engines. */
  private def cleanFragment(noTags: Column): Column = {
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(unescaped, lit("[ \\t\\n\\r\\f]+"), lit(" ")))
  }

  /** Block-level tag boundaries — the segmentation a jusText-style
    * content classifier works on. RE2-safe ((?i), no lookarounds), so
    * the DuckDB oracle splits identically. */
  private val BlockTagPattern =
    "(?i)</?(?:p|div|nav|footer|header|h[1-6]|li|ul|ol|table|title|head|body|html)[^>]*>"

  /** Boilerplate/content BLOCK classification (jusText-core) — the step
    * production crawl pipelines (CCNet/RefinedWeb) run after tag
    * stripping: tag removal is not boilerplate removal, and nav/footer
    * chrome surviving into a training corpus is the single biggest
    * quality leak after dedup. The page is split at block-level tag
    * boundaries (script/style subtrees dropped first); each block is
    * cleaned (tag strip → entity decode → whitespace collapse) and
    * paired with its LINK TEXT (the classifier's strongest feature);
    * empty blocks vanish. Returns `array<struct<clean, link>>`. All pure
    * codegen'd expressions — no UDF — and RE2-safe for oracle replay. */
  def htmlBlocks(html: Column): Column = {
    val blocks = split(dropSubtrees(html), BlockTagPattern)
    filter(
      transform(blocks, b => struct(
        cleanFragment(regexp_replace(b, lit("<[^>]*>"), lit(" "))).as("clean"),
        cleanFragment(array_join(regexp_extract_all(b,
          lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)), " ")).as("link"))),
      s => s.getField("clean") =!= lit(""))
  }

  /** The content decision per block: long enough to be prose AND link
    * density ≤ 0.3 (all-integer arithmetic — `10·|link| ≤ 3·|clean|` —
    * so the cross-engine compare never touches a float). Length + link
    * density are jusText's two strongest features and are
    * language-neutral, which matters for a multilingual corpus. */
  def isContentBlock(s: Column): Column =
    length(s.getField("clean")) >= lit(25) &&
      length(s.getField("link")) * lit(10) <= length(s.getField("clean")) * lit(3)

  /** Content text after boilerplate drop: the kept blocks joined. */
  def htmlContentText(blocks: Column): Column =
    array_join(transform(filter(blocks, isContentBlock(_)),
      s => s.getField("clean")), " ")

  /** RFC 3986-lite URL normalization — the crawl pipeline's FIRST and
    * cheapest dedup key (the same page arrives as `HTTPS://Host:443/x`,
    * `https://host/x#frag`, and `https://host/x?utm_source=feed`):
    * case-fold scheme + host, strip the scheme's default port, drop the
    * fragment, drop tracking params (utm_*, fbclid, gclid), and SORT the
    * surviving query params; an empty path canonicalizes to `/`. Pure
    * RE2-safe expression chain (no lookarounds, anchored classes), so
    * the DuckDB oracle replays it verbatim. URLs without a scheme pass
    * through fragment-stripped only — normalization never invents
    * structure it didn't parse. */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, lit("#.*"), lit(""))
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag,
      lit("^[A-Za-z][A-Za-z0-9+.-]*://"), lit(""))
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathq = regexp_replace(rest, lit("^[^/?]*"), lit(""))
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathq, "^[^?]*\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    val qs = array_join(array_sort(params), "&")
    when(scheme === "", noFrag).otherwise(concat(scheme, lit("://"), host,
      path, when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  /** Rolling hash over tokens (order-sensitive, 64-bit) — a cheap
    * shift-resistant document signature. Chained xxhash64 rather than the
    * classic polynomial form: ANSI mode (Spark 4 default) would throw on the
    * polynomial's intentional Long wrap-around. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(1125899906842597L), (acc, t) => xxhash64(acc, t))

  /** Cross-engine rolling fingerprint: chained md5 hex over the tokens
    * (acc := md5(acc + "|" + token)) — any engine with md5 and a list fold
    * re-derives it exactly (the DuckDB oracle does via `list_reduce`).
    * Native one-pass kernel ([[graft.functions.RollingMd5]]);
    * [[rollingHashMd5Hof]] is the bit-identical HOF form (spec cross-check).
    * [[rollingHash]]'s xxhash64 chain stays the throughput path. */
  def rollingHashMd5(text: Column, seed: String = "graft"): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_rollingmd5", tokens(text), lit(seed))
  }

  /** NFC Unicode canonicalization ([[graft.functions.NfcNormalize]] codegen
    * kernel): composed and decomposed spellings of the same content become
    * byte-identical, so downstream fingerprints/dedup see one form. Run it
    * BEFORE any hashing stage of a curation pipeline. */
  def nfcNormalize(text: Column): Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_nfc", text)
  }

  /** Interpreted-HOF md5 rolling hash (reference semantics for the kernel). */
  def rollingHashMd5Hof(text: Column, seed: String = "graft"): Column =
    aggregate(tokens(text), lit(seed),
      (acc, t) => md5(concat(acc, lit("|"), t)))
}

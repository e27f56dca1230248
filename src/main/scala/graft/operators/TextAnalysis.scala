package graft.operators

import graft.Graft
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure column expressions →
  * stay inside WholeStageCodegen, fully distributed. */
object TextAnalysis {

  /** BPE-ish token pattern: word pieces, numbers, or single non-space
    * punctuation — a public approximation of GPT-style pre-tokenization. */
  val BpeTokenPattern: String = """'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"""

  private val EnglishStopwords = Seq(
    "the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
    "with", "are", "this", "not", "a", "an", "on", "as", "at", "by")

  def langId(text: Column): Column = call_function("lang_id", text)

  /** Char-n-gram Naive Bayes language ID, 28 languages / 9 scripts
    * (graft.functions.LangNb) — prefer over the stopword [[langId]] for
    * routing real multilingual corpora. Codegen'd static call; the
    * model is a per-JVM lazy table (~4 MB), map-only in plans. */
  def langIdNb(text: Column): Column = call_function("lang_id_nb", text)

  /** Gopher-style repetition signals: fraction of duplicate (trimmed,
    * non-blank) lines, and the most frequent token's share of all tokens.
    * High values flag boilerplate/template documents for removal. */
  def dupLineFraction(text: Column): Column = call_function("dup_line_fraction", text)
  def topTokenFraction(text: Column): Column = call_function("top_token_fraction", text)

  /** PII redaction for training corpora: emails → `<EMAIL>`, URLs →
    * `<URL>`, NANP-style phone numbers → `<PHONE>`. Pure
    * `regexp_replace` chain (codegen'd, no UDF); patterns are RE2-safe so
    * the same SQL runs on other engines. URL first so an address inside a
    * URL redacts as one unit. */
  def redactPii(text: Column): Column = {
    val url = regexp_replace(text, lit("https?://[^\\s]+"), lit("<URL>"))
    val email = regexp_replace(url,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    regexp_replace(email, lit("\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"), lit("<PHONE>"))
  }

  /** Main-content text from an HTML document — the extraction step
    * between web-archive ingest ([[graft.sources.warc.WarcDataSource]])
    * and quality filtering in a Common-Crawl-style pipeline. A
    * deterministic regex pipeline, pure codegen'd column expressions
    * (no UDF): script/style/comment blocks drop whole, every remaining
    * tag becomes ONE space (word boundaries survive block tags), the
    * five XML entities plus `&nbsp;`/`&#39;` decode (`&amp;` last so
    * double-escapes cannot double-decode), whitespace collapses. All
    * patterns are RE2-safe with an explicit whitespace class, so an
    * external engine running the identical chain reproduces the output
    * byte-for-byte (the q_html_text oracle does). */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, lit("(?is)<script[^>]*>.*?</script>"), lit(" "))
    val noStyle = regexp_replace(noScript, lit("(?is)<style[^>]*>.*?</style>"), lit(" "))
    val noComment = regexp_replace(noStyle, lit("(?s)<!--.*?-->"), lit(" "))
    val noTags = regexp_replace(noComment, lit("<[^>]+>"), lit(" "))
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        call_function("replace", c, lit(e), lit(r))
      }
    trim(regexp_replace(decoded, lit("[ \\t\\r\\n\\f]+"), lit(" ")))
  }

  /** Canonical form of an absolute http(s) URL — the key for URL-level
    * dedup (the pre-pass web-crawl pipelines run before any content
    * dedup: the same page fetched as `HTTP://WWW.X.COM:80/a?b=2&a=1#f`
    * and `http://www.x.com/a?a=1&b=2` must collapse). Scheme and host
    * lowercase, default ports strip (`:80` http / `:443` https),
    * fragments drop, query parameters sort bytewise, an empty path
    * becomes `/`. Pure column expressions (regexp_extract / array_sort —
    * codegen'd, no UDF) with engine-portable regexes; a value without an
    * http(s) scheme passes through unchanged. */
  def normalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http" && hostPort.endsWith(":80"),
        regexp_replace(hostPort, lit(":80$"), lit("")))
      .when(scheme === "https" && hostPort.endsWith(":443"),
        regexp_replace(hostPort, lit(":443$"), lit("")))
      .otherwise(hostPort)
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val sortedQuery = array_join(array_sort(split(query, "&")), "&")
    when(scheme === "http" || scheme === "https",
      concat(scheme, lit("://"), host,
        when(path === "", "/").otherwise(path),
        when(query === "", "").otherwise(concat(lit("?"), sortedQuery))))
      .otherwise(u)
  }

  /** PSL registered domain from an absolute URL (`a.b.example.com` →
    * `example.com`, `news.bbc.co.uk` → `bbc.co.uk`), ports stripped —
    * the grouping key for per-domain mixing/filtering
    * ([[graft.operators.Corpus.mixture]] keys, [[domainFilter]]
    * blocklists, URL-level dedup). Suffix rules come from the bundled
    * [[graft.functions.PublicSuffix.snapshotRules]] snapshot (unlisted
    * suffixes fall back to last-two-labels — the pre-PSL behavior);
    * NULL when no http(s) host parses or the host is itself a public
    * suffix. The lookup is a native codegen'd expression
    * ([[graft.functions.RegisteredDomain]]), not a UDF. */
  def urlDomain(u: Column): Column = {
    val host = urlHost(u)
    nullif(call_function("registered_domain", host), lit(""))
  }

  /** [[urlDomain]] with caller-supplied PSL rules — pass the lines of a
    * full, current publicsuffix.org file when the bundled snapshot's
    * coverage matters. The rules travel as a foldable literal; the
    * matcher is compiled ONCE at analysis time (see GraftExtensions'
    * registered_domain builder) and codegen-referenced, so the per-row
    * cost is identical to the bundled-snapshot path. */
  def urlDomain(u: Column, pslRules: Seq[String]): Column = {
    val host = urlHost(u)
    nullif(call_function("registered_domain", host,
      lit(pslRules.mkString("\n"))), lit(""))
  }

  private def urlHost(u: Column): Column = regexp_replace(
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)),
    lit("\\.$"), lit(""))

  /** Drop rows whose URL's registered domain is on the blocklist — the
    * standard crawl-corpus hygiene pass (C4/FineWeb-style adult/spam
    * domain filtering), matching every subdomain because [[urlDomain]]
    * collapses `a.b.example.com` to `example.com`. The literal-list
    * shape compiles to a codegen'd scan-level NOT IN predicate (no
    * join, no shuffle); rows with no parseable http(s) host (null
    * domain) are KEPT — a blocklist can only veto what it can name.
    * Domains compare lowercase. */
  def domainFilter(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    df.where(not(coalesce(
      urlDomain(col(urlCol)).isin(blocked.map(_.toLowerCase(java.util.Locale.ROOT)): _*),
      lit(false))))
  }

  /** Blocklist-table shape for big lists: broadcast LEFT ANTI join on
    * the registered domain. Same keep-on-null semantics as the literal
    * shape (anti join keeps non-matching rows, and null never matches).
    * At 100 TB the corpus never shuffles — the blocklist broadcasts. */
  def domainFilter(df: DataFrame, urlCol: String, blocked: DataFrame,
                   domainCol: String): DataFrame =
    df.join(
      broadcast(blocked.select(
        lower(col(domainCol)).as("__graft_blocked_domain")).distinct()),
      urlDomain(col(urlCol)) === col("__graft_blocked_domain"), "left_anti")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count via regexp matches. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  /** Ratio of non-alphanumeric-non-space chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / length(text))

  /** Fraction of whitespace tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) === 0, 0.0).otherwise(
      size(filter(words, w => w.isin(EnglishStopwords: _*))).cast("double") / size(words))
  }

  /** Mean whitespace-token length — degenerate for boilerplate/garbage. */
  def meanWordLength(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    when(size(words) === 0, 0.0).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(words))
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Edit-robust rolling-hash fingerprint (winnowing-style min-hash), md5
    * window hash — reproducible by external SQL engines (the DuckDB oracle),
    * at O(n·window) digest cost. Prefer [[fingerprintRollingFast]] in
    * production pipelines. */
  def fingerprintRolling(text: Column, window: Int = 16): Column =
    call_function("rolling_fingerprint", text, lit(window))

  /** Same winnowing fingerprint with a true O(n) rolling polynomial hash —
    * the production kernel for 100 TB corpora (one multiply-add per char
    * instead of an md5 digest per window). Values differ from
    * [[fingerprintRolling]]; robustness properties are identical. */
  def fingerprintRollingFast(text: Column, window: Int = 16): Column =
    call_function("rolling_fingerprint_fast", text, lit(window))

  /** The C4/Gopher quality conjunction as a reusable predicate column —
    * null text yields null (three-valued logic applies at the caller). */
  def qualityPass(t: Column,
                  minChars: Int = 200, maxChars: Int = 1000000,
                  minTokens: Int = 5, maxPunctRatio: Double = 0.3,
                  minStopwordRatio: Double = 0.0,
                  minMeanWordLen: Double = 2.0,
                  maxMeanWordLen: Double = 12.0): Column =
    length(t).between(minChars, maxChars) &&
      tokenCountWs(t) >= minTokens &&
      punctRatio(t) <= maxPunctRatio &&
      stopwordRatio(t) >= minStopwordRatio &&
      meanWordLength(t).between(minMeanWordLen, maxMeanWordLen)

  /** C4/Gopher-style quality gate: keeps rows passing all bounds. Pure
    * column predicates — fully pushed into the scan stage, no extra pass.
    * Bounds follow the published C4 heuristics adapted to column form. */
  def qualityFilter(df: DataFrame, textCol: String,
                    minChars: Int = 200, maxChars: Int = 1000000,
                    minTokens: Int = 5, maxPunctRatio: Double = 0.3,
                    minStopwordRatio: Double = 0.0,
                    minMeanWordLen: Double = 2.0,
                    maxMeanWordLen: Double = 12.0): DataFrame =
    df.where(qualityPass(col(textCol), minChars, maxChars, minTokens,
      maxPunctRatio, minStopwordRatio, minMeanWordLen, maxMeanWordLen))

  /** One-pass corpus statistics: document/token totals plus length and
    * quality percentiles (t-digest `percentile_approx` — mergeable sketches,
    * one aggregate over the corpus, no sort). */
  def corpusStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(length(t).cast("long").as("n_chars"),
        tokenCountWs(t).cast("long").as("n_tokens"),
        punctRatio(t).as("punct"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        avg("n_chars").as("mean_chars"),
        expr("percentile_approx(n_chars, array(0.1, 0.5, 0.9, 0.99))").as("chars_p10_50_90_99"),
        expr("percentile_approx(n_tokens, array(0.1, 0.5, 0.9, 0.99))").as("tokens_p10_50_90_99"),
        expr("percentile_approx(punct, 0.99)").as("punct_p99"))
  }

  /** Bigram language model learned FROM a reference corpus: top-`topK`
    * bigram counts + their unigram context counts, collected bounded and
    * broadcast. The standard pipeline shape for LM-based quality scoring
    * (CCNet-style): counts shuffle by token (vocab-bounded), the model is
    * driver-bounded by topK, scoring is map-side only. */
  case class BigramModel(unigrams: Map[String, Long],
                         bigrams: Map[(String, String), Long],
                         vocab: Long)

  def bigramModel(df: DataFrame, textCol: String, topK: Int = 50000): BigramModel = {
    val words = df.select(split(lower(trim(col(textCol))), "\\s+").as("ws"))
    // deterministic tie-break (count, then lexicographic) so the model —
    // and everything scored with it — is reproducible across runs/engines
    val bigramCounts = words
      .select(explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), (w, i) -> struct(w as w1, element_at(ws, i + 2) as w2))")).as("bg"))
      .groupBy("bg.w1", "bg.w2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val unigramCounts = words
      .select(explode(col("ws")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(topK)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    BigramModel(unigramCounts, bigramCounts, unigramCounts.size.toLong.max(1L))
  }

  /** Mean add-one-smoothed bigram log-probability per document — higher is
    * more model-like; gibberish and boilerplate-free noise score low. The
    * model rides a broadcast; scoring is embarrassingly parallel. */
  def lmScore(df: DataFrame, textCol: String, model: BigramModel): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val score = udf { text: String =>
      if (text == null) 0.0
      else {
        val m = bc.value
        val ws = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 2) 0.0
        else {
          var sum = 0.0
          var i = 0
          while (i < ws.length - 1) {
            val c2 = m.bigrams.getOrElse((ws(i), ws(i + 1)), 0L)
            val c1 = m.unigrams.getOrElse(ws(i), 0L)
            sum += math.log((c2 + 1.0) / (c1 + m.vocab))
            i += 1
          }
          sum / (ws.length - 1)
        }
      }
    }
    df.withColumn("lm_logprob", score(col(textCol)))
  }

  /** THE whitespace tokenizer every gram-level operator shares
    * (lowercase → trim → split on runs of whitespace → drop empties).
    * Load-bearing for oracle parity: every DuckDB oracle replays exactly
    * `list_filter(string_split_regex(lower(trim(text)), '\s+'), w -> w
    * <> '')`, so the expression must exist in ONE place — a drift in a
    * private copy would silently break a hash proof. */
  private[graft] def wsTokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= lit(""))

  /** All word n-grams of `text` (whitespace-tokenized, lowercased),
    * joined back to strings; a document shorter than `n` words has
    * none. Pure column expression — no UDF, stays in codegen. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be positive, got $n")
    val ws = wsTokens(text)
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word-window hashes of each row's text — the
    * [[graft.operators.Corpus.dupSpanStats]] `word_window_hashes` kernel
    * (one rolling md5 per window, 60-bit values, exactly reproducible in
    * external SQL engines), instead of materialized n-gram STRINGS: the
    * join keys and the broadcast set carry 8-byte longs, and the n-gram
    * text is never allocated. */
  private def ngramHashes(df: DataFrame, textCol: String, n: Int): Column = {
    graft.Graft.register(df.sparkSession)
    array_distinct(call_function("word_window_hashes", wsTokens(col(textCol)), lit(n)))
  }

  /** A pre-built decontamination probe: the evaluation suite's distinct
    * word-`n`-gram hashes, cached so repeated decontamination calls (new
    * corpus drops, several corpora against one benchmark) pay the
    * eval-side build once. Call [[release]] when done. */
  final class BenchmarkNgrams private[TextAnalysis] (val n: Int,
                                                     private[TextAnalysis] val hashes: DataFrame) {
    def release(): Unit = { hashes.unpersist() }
  }

  /** Build (and cache) the benchmark side of [[decontaminate]] once. */
  def prepareBenchmark(benchmark: DataFrame, textCol: String, n: Int = 8): BenchmarkNgrams = {
    val h = benchmark.select(explode(ngramHashes(benchmark, textCol, n)).as("__ngh"))
      .distinct().cache()
    h.count() // materialize now, so every later call starts from the cache
    new BenchmarkNgrams(n, h)
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minOverlap` distinct word `n`-grams with an evaluation set, with
    * their overlap counts — the standard pre-training hygiene step that
    * keeps eval answers out of the training corpus (n-gram-overlap
    * matching as published for GPT-3/PaLM-style dedup against
    * benchmarks).
    *
    * Scale design: evaluation suites are small by nature (thousands of
    * documents), so their DISTINCT n-gram HASHES broadcast (8 bytes per
    * n-gram — the n-gram strings are never materialized on either side);
    * the corpus side explodes its window hashes — de-duplicated per
    * document map-side, so a boilerplate document repeating a leaked
    * n-gram K times probes the join once, not K times — and only the HIT
    * rows, rare by construction and already unique per (document, hash),
    * reach the one shuffle (a plain per-document count, no distinct
    * aggregate). The 100 TB corpus is never shuffled and never holds
    * more than a partition's hashes in flight. Both sides use the same
    * md5-derived window hash, so a (vanishingly unlikely) collision is
    * seen identically by any engine reproducing the hash — results stay
    * exactly comparable. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 8, minOverlap: Int = 1): DataFrame =
    decontaminateAgainst(corpus, idCol, textCol, n, minOverlap,
      benchmark.select(explode(ngramHashes(benchmark, textCol, n)).as("__ngh")).distinct())

  /** [[decontaminate]] against a [[prepareBenchmark]] handle: the
    * eval-side distinct+broadcast build (the per-call constant) is
    * amortized across calls. */
  def decontaminate(corpus: DataFrame, prepared: BenchmarkNgrams,
                    idCol: String, textCol: String, minOverlap: Int): DataFrame =
    decontaminateAgainst(corpus, idCol, textCol, prepared.n, minOverlap, prepared.hashes)

  private def decontaminateAgainst(corpus: DataFrame, idCol: String, textCol: String,
                                   n: Int, minOverlap: Int, bench: DataFrame): DataFrame =
    corpus.select(col(idCol), explode(ngramHashes(corpus, textCol, n)).as("__ngh"))
      .join(broadcast(bench), "__ngh")
      .groupBy(idCol).agg(count(lit(1)).as("hit_ngrams"))
      .where(col("hit_ngrams") >= minOverlap)

  /** One-call quality report over a document table. */
  def qualityReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Graft.register(df.sparkSession)
    val t = col(textCol)
    df.select(col(idCol),
      length(t).as("n_chars"),
      tokenCountWs(t).as("n_tokens_ws"),
      tokenCountBpe(t).as("n_tokens_bpe"),
      round(punctRatio(t), 4).as("punct_ratio"),
      round(stopwordRatio(t), 4).as("stopword_ratio"),
      round(meanWordLength(t), 4).as("mean_word_len"),
      langId(t).as("lang_pred"),
      fingerprintMd5(t).as("fp_md5"),
      fingerprintRolling(t).as("fp_rolling"))
  }
}

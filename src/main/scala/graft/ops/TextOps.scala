package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines (north-star extension):
  * tokenization, top-terms, quality scoring, token counting, language ID,
  * fingerprinting. Everything is per-row column arithmetic or a single
  * aggregation — no UDFs, no collect, all codegen'd.
  */
object TextOps {

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Whitespace tokenizer (lowercased). */
  def tokenize(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish tokenizer: letter runs, digit runs, single punctuation —
    * the pre-tokenization regex shape used by byte-pair encoders. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpeishPattern), lit(0))

  /** Top-k corpus terms after stopword removal. */
  def topTerms(df: DataFrame, textCol: String, k: Int,
      stopwords: Seq[String] = defaultStopwords): DataFrame =
    df.select(explode(tokenize(col(textCol))).as("term"))
      .filter(length(col("term")) > 0 && !col("term").isin(stopwords: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)

  /** Vocabulary build: (token, n, token_id) with dense ids 0..V−1
    * assigned by (count DESC, token) — the tokenizer-training step
    * between corpus and model. Tokens below `minCount` are pruned
    * BEFORE id assignment (ids stay dense); `maxSize` keeps the top V.
    *
    * Scale shape: the corpus-sized work is the explode + partial-agg
    * count (map-side combine absorbs hot tokens, one shuffle on the
    * token). Dense ids are then assigned over the AGGREGATED vocabulary
    * WITHOUT a global-window row_number (a 10⁸–10⁹-token web-corpus
    * vocab must not funnel through one task): a range-partitioned total
    * sort by (n DESC, token) gives each partition a contiguous id range,
    * and `zipWithIndex` turns per-partition element counts into offsets
    * — every stage stays parallel, and the extra cost is one small
    * count job over the sorted vocab. Ties break on the token, so ids
    * are stable across runs, partitionings, and engines. */
  def buildVocab(df: DataFrame, textCol: String, minCount: Long = 1L,
      maxSize: Option[Int] = None): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    maxSize.foreach(m => require(m >= 1, s"maxSize must be >= 1, got $m"))
    val counts = df.select(explode(tokenize(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val withId = denseIds(counts, "token", "n")
    maxSize.fold(withId)(m => withId.filter(col("token_id") < m))
  }

  /** Dense id assignment over an aggregated (token, count) table:
    * appends `token_id` = rank by (`cntCol` DESC, `tokCol` ASC), ids
    * 0..V−1 with no gaps. The parallel id-assignment core shared by
    * [[buildVocab]] and [[BpeOps.packSequenceIds]]'s piece vocabulary:
    * a range-partitioned total sort gives each partition a contiguous
    * id range and `zipWithIndex` turns per-partition counts into
    * offsets — no global-window row_number funneling the vocab through
    * one task. Ties break on the token, so ids are stable across runs,
    * partitionings, and engines. */
  private[ops] def denseIds(counts: DataFrame, tokCol: String,
      cntCol: String): DataFrame = {
    val sorted = counts.orderBy(col(cntCol).desc, col(tokCol))
    val schema = sorted.schema.add("token_id", LongType, nullable = false)
    counts.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      },
      schema)
  }

  /** Per-document quality features + a composite score. All counts are
    * integers and all ratios are single IEEE divisions — deterministic
    * across engines and partitionings. */
  def qualityFeatures(df: DataFrame, textCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val toks = tokenize(col(textCol))
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("n_chars_m", length(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stop", size(filter(toks, t => array_contains(stopArr, t))))
      .withColumn("n_punct", size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9\\s]"), lit(0))))
      .withColumn("avg_token_len",
        (col("n_chars_m") - (col("n_tokens") - lit(1))).cast(DoubleType) / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct").cast(DoubleType) / col("n_chars_m"))
      // higher = better: long enough, not stopword-soup, not punctuation-soup
      .withColumn("quality_score",
        least(col("n_tokens").cast(DoubleType) / lit(64.0), lit(1.0)) *
          (lit(1.0) - col("stop_ratio")) * (lit(1.0) - col("punct_ratio")))
  }

  /** Language ID by stopword-profile scoring: count (with multiplicity)
    * tokens from each language's marker set; argmax with a fixed
    * priority-order tie-break (en, de, es, fr, zh). Deterministic and
    * SQL-expressible; real-text validation lives in TextOpsSpec. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "you", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "mit"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "por"),
    "fr" -> Seq("le", "les", "des", "est", "et", "que", "je", "pas"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不", "这", "有"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokenize(text)
    langMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
  }

  /** Predicted language column (first language in priority order whose
    * score ties the max). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(maxScore === 0, lit("und"))) {
      case (acc, (lang, s)) => acc.when(s === maxScore, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  /** Token n-gram array (whole text as one gram for docs shorter than n). */
  def ngrams(text: Column, n: Int = 2): Column = {
    val toks = tokenize(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Repetition ratio: occurrences of the most frequent n-gram over total
    * n-grams — the classic "document is a loop" training-data filter.
    * Takes an already-projected gram ARRAY column: the counting lambda
    * references the array per gram, so an inlined `ngrams(...)` tree
    * would be rebuilt O(len) times per row (the CollapseProject/HOF trap
    * — see DedupOps.minhashSignatureFromShingles). O(len²) equality
    * checks per row, bounded by document length. */
  def repetitionRatioFromGrams(grams: Column): Column =
    array_max(transform(grams, g => size(filter(grams, h => h === g))))
      .cast(DoubleType) / size(grams)

  /** Gopher-style composite quality rules (Rae et al. 2021, table A1 —
    * public heuristics): per-document rule flags plus the AND'd keep
    * decision. Pure per-row column arithmetic (integer counts + single
    * IEEE divisions), zero shuffle, fully SQL-restatable. Thresholds
    * are parameters so a pipeline can tighten them per source. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  def gopherQualityFlags(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val toks = tokenize(col(textCol))
    val stopArr = array(gopherStopwords.map(lit): _*)
    val nWords = size(toks)
    // exact integer char total; mean = one IEEE division
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen = charSum.cast(DoubleType) / nWords
    val nSymbol = size(regexp_extract_all(col(textCol), lit("#|\\.\\.\\."), lit(0)))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]")))
    // DISTINCT stopwords present (Rae et al. 2021 A1 and common
    // reimplementations count presence, not instances — 'the the' is one)
    val nStop = size(filter(stopArr, s => array_contains(toks, s)))
    val fWordCount = nWords >= minWords && nWords <= maxWords
    val fMeanLen = meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val fSymbol = nSymbol.cast(DoubleType) / nWords <= maxSymbolRatio
    val fAlpha = nAlpha.cast(DoubleType) / nWords >= minAlphaRatio
    val fStop = nStop >= minStopwords
    df.withColumn("n_words", nWords.cast(LongType))
      .withColumn("mean_word_len", meanLen)
      .withColumn("ok_word_count", fWordCount.cast(IntegerType))
      .withColumn("ok_mean_len", fMeanLen.cast(IntegerType))
      .withColumn("ok_symbol_ratio", fSymbol.cast(IntegerType))
      .withColumn("ok_alpha_ratio", fAlpha.cast(IntegerType))
      .withColumn("ok_stopwords", fStop.cast(IntegerType))
      .withColumn("keep",
        (fWordCount && fMeanLen && fSymbol && fAlpha && fStop).cast(IntegerType))
  }

  /** C4-style heuristic cleaning (the line-structure rule family,
    * complementing [[gopherQualityFlags]]'s corpus-statistic rules):
    * a LINE is retained iff it ends in terminal punctuation (. ! ? ")
    * and has ≥ `minLineWords` words; a DOCUMENT is kept iff it contains
    * no "lorem ipsum" boilerplate, no curly brace (template/code
    * leakage), and retains ≥ `minLinesKept` lines. Emits per-rule flags
    * plus the rebuilt `clean_text` (retained lines re-joined), so the
    * filter is auditable (aggregate the flags) and composable (train on
    * `clean_text`). Pure per-row column expressions: zero shuffle,
    * codegen'd, scales linearly with corpus bytes. */
  def c4QualityFlags(df: DataFrame, textCol: String,
      minLineWords: Int = 5, minLinesKept: Int = 3): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1, got $minLineWords")
    require(minLinesKept >= 1, s"minLinesKept must be >= 1, got $minLinesKept")
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords)
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{")
    val nKept = size(kept)
    df.withColumn("n_lines", size(lines).cast(LongType))
      .withColumn("n_lines_kept", nKept.cast(LongType))
      .withColumn("has_lorem", hasLorem.cast(IntegerType))
      .withColumn("has_brace", hasBrace.cast(IntegerType))
      .withColumn("keep",
        (!hasLorem && !hasBrace && nKept >= minLinesKept).cast(IntegerType))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** HTML → main-content text extraction: the front stage a crawl
    * pipeline runs BEFORE the text-quality ladder (the quality rules
    * assume plain text; a raw page is mostly markup, scripts, and
    * boilerplate chrome). Four zero-shuffle passes of per-row column
    * expressions, then a line-density content heuristic:
    *
    *  1. drop invisible content wholesale: `<script>…</script>`,
    *     `<style>…</style>` (case-insensitive, non-greedy, across
    *     newlines) and `<!-- comments -->` — stripping only the TAGS
    *     would leak code/CSS into the text (and its braces into
    *     [[c4QualityFlags]]' has_brace rule);
    *  2. turn block-level tag boundaries (p, div, li, headings, table
    *     rows, nav/header/footer, br, …) into newlines, so the page's
    *     visual line structure survives tag removal;
    *  3. strip every remaining tag to a space and decode the basic
    *     entities (`&lt; &gt; &quot; &#39; &nbsp;`, and `&amp;` LAST so
    *     `&amp;lt;` decodes to the literal `&lt;` — the HTML escaping
    *     round-trip, not a double decode);
    *  4. split on newlines, collapse internal whitespace, drop empty
    *     lines.
    *
    * A line is then CONTENT iff it has ≥ `minContentWords` words (line
    * density — boilerplate chrome is short) OR an ADJACENT line is
    * dense (the jusText-style promotion that rescues headings and
    * short closers attached to real paragraphs, while isolated nav /
    * footer / title lines stay dropped). Emits `n_raw_lines`,
    * `n_content_lines`, and `content_text` (kept lines re-joined) —
    * feed `content_text` to [[c4QualityFlags]] / [[gopherQualityFlags]].
    * NULL html extracts to zero lines and an empty `content_text`.
    *
    * The density arrays are staged as columns and indexed with
    * `element_at` inside the lambdas (an O(1) attribute lookup) — a
    * non-trivial expression referenced inside a HOF lambda body would
    * re-evaluate once per element. */
  def htmlExtract(df: DataFrame, htmlCol: String,
      minContentWords: Int = 5): DataFrame = {
    require(minContentWords >= 1,
      s"minContentWords must be >= 1, got $minContentWords")
    val noInvisible = regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(col(htmlCol), lit("")),
          "(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
        "(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
      "(?s)<!--.*?-->", " ")
    val blockPat = "(?i)<(?:/?(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote" +
      "|section|article|header|footer|nav|title|head|body|html)\\b[^>]*" +
      "|br\\s*/?)>"
    val withBreaks = regexp_replace(noInvisible, blockPat, "\n")
    val noTags = regexp_replace(withBreaks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ent),
          java.util.regex.Matcher.quoteReplacement(ch))
      }
    df.withColumn("_lines",
        filter(
          transform(split(decoded, "\n"),
            l => trim(regexp_replace(l, "\\s+", " "))),
          l => length(l) > 0))
      .withColumn("_dense",
        transform(col("_lines"), l => size(split(l, " ")) >= minContentWords))
      .withColumn("_n", size(col("_lines")))
      // sequence(1, 0) would DESCEND — guard the empty case explicitly
      .withColumn("_mask",
        when(col("_n") === 0, typedlit(Seq.empty[Boolean]))
          .otherwise(transform(sequence(lit(1), col("_n")), i =>
            element_at(col("_dense"), i) ||
              when(i > 1, element_at(col("_dense"), i - 1))
                .otherwise(lit(false)) ||
              when(i < col("_n"), element_at(col("_dense"), i + 1))
                .otherwise(lit(false)))))
      .withColumn("_content",
        filter(col("_lines"), (l, i) => element_at(col("_mask"), i + 1)))
      .withColumn("n_raw_lines", col("_n").cast(LongType))
      .withColumn("n_content_lines", size(col("_content")).cast(LongType))
      .withColumn("content_text", array_join(col("_content"), "\n"))
      .drop("_lines", "_dense", "_n", "_mask", "_content")
  }

  /** URL decomposition for crawl-corpus front stages — the stage BEFORE
    * [[htmlExtract]] in a real pipeline (URL-level filtering is cheaper
    * than any content look). Regexp-only column programs: codegen'd,
    * zero-shuffle, and deliberately restatable through ANSI
    * `regexp_extract` so URL-keyed keys stay fully oracled. `urlHost`
    * strips scheme, userinfo, port, and everything from the first
    * `/?#`; no-match (schemeless input) yields the empty string in
    * both engines — filter on it explicitly if absolute URLs are a
    * precondition. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))

  /** Registrable domain ("eTLD+1") of a host — the grouping grain for
    * domain caps and blocklists. Backed by [[PslDomain]]'s bundled
    * Public Suffix List snapshot (the PSL is a data file, not an
    * algorithm: `co.uk` / `com.au` need that table); TLDs absent from
    * the snapshot fall through to the PSL default rule, which IS the
    * old last-two-label heuristic — unknown-TLD behavior is unchanged.
    * Zero-shuffle column program: hash-set probes, no join, no UDF. */
  def urlDomain(host: Column): Column =
    PslDomain.registrableDomain(host)

  /** Path component (leading `/`, query/fragment stripped); empty
    * string when the URL has no path. */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Canonical URL for crawl dedup — the normalization that makes
    * recrawls of the same page COMPARE equal before any content is
    * fetched or hashed: fragment stripped (never sent to the server),
    * scheme+authority lowercased (case-insensitive per RFC 3986; the
    * path is NOT — it is case-sensitive), default ports dropped
    * (:80/http, :443/https), tracking query parameters removed
    * (lowercase `utm_*`, `gclid`, `fbclid` — the conservative
    * published set; other params keep their original order, which IS
    * significant to some servers), and an empty path normalized to
    * "/". Non-URL strings (no scheme://) yield NULL — a quarantine
    * signal, not a fabricated canonical form.
    *
    * Pure regexp column program (zero-shuffle, codegen'd, and every
    * pattern is RE2-compatible so an external engine can restate it).
    * Deliberately NOT done: duplicate-slash collapse, dot-segment
    * resolution, percent-decoding — each changes which resource some
    * real servers serve, the line between canonicalization and
    * rewriting. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    // split path from query FIRST: '&' is a legal path character, so
    // the tracker passes must only ever see the query string — on the
    // whole rest they would delete "&gclid=…/x" out of a PATH and
    // collapse two distinct resources (caught in round-10 review)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "(\\?.*)$", 1)
    // tracking-param removal in three anchored passes over the query:
    // all non-leading occurrences, then a leading one with followers
    // (keep the '?'), then a sole one (drop the '?') — order matters,
    // the first pass guarantees at most one tracker remains for the
    // anchored two
    val tracker = "(utm_[^=&]*|gclid|fbclid)=[^&]*"
    val q1 = regexp_replace(query, "&" + tracker, "")
    val q2 = regexp_replace(q1, "\\?" + tracker + "&", "?")
    val q3 = regexp_replace(q2, "\\?" + tracker + "$", "")
    // empty path is always '/', with or without a query: per HTTP
    // semantics http://a.com?x and http://a.com/?x are one resource
    val pathNorm = when(path === "", lit("/")).otherwise(path)
    when(scheme === "" || auth === "", lit(null).cast(StringType))
      .otherwise(concat(scheme, lit("://"), authNoPort, pathNorm, q3))
  }

  /** Domain-diversity cap (the RefinedWeb/C4 front-stage shape): drop
    * blocklisted registrable domains, then keep at most `n` documents
    * per remaining domain — a deterministic uniform draw via
    * [[SampleOps.samplePerGroup]], so one over-crawled host cannot
    * dominate the corpus mix. Appends `host` and `domain` columns.
    *
    * Scale shape: the regex projection is zero-shuffle; the cap is the
    * per-group rank filter that plans through the two-phase TopKPerKey
    * strategy (map-side heaps bound the Exchange to ≤ domains×n rows —
    * exactly the right cost model when the cap is the point). */
  def domainDiversityCap(df: DataFrame, urlCol: String, idCol: String,
      n: Int, seed: Long = 0L, blocked: Seq[String] = Nil): DataFrame = {
    val withDomain = df
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", urlDomain(col("host")))
    val kept =
      if (blocked.isEmpty) withDomain
      else withDomain.filter(!col("domain").isin(blocked: _*))
    SampleOps.samplePerGroup(kept, "domain", idCol, n, seed)
  }

  /** Sliding-window chunking: split each document into `win`-token
    * chunks every `stride` tokens — the sequence-prep step between a
    * cleaned corpus and a trainer (overlap = win − stride preserves
    * cross-boundary context). Short docs yield their whole text as
    * chunk 0. Pure per-row transform + explode: no shuffle, output
    * rows ∝ tokens/stride. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      win: Int, stride: Int): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    require(stride >= 1 && stride <= win,
      s"stride must be in [1, win], got $stride (win $win)")
    val toks = tokenize(col(textCol))
    // last window start: the smallest multiple of stride covering the
    // tail — ceil((n - win) / stride), clamped at 0 for short docs
    val nChunks = greatest(lit(0L),
      ceil((size(toks) - win).cast(DoubleType) / stride).cast(LongType)) + 1L
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0L), nChunks - 1L),
          i => array_join(slice(toks, (i * stride + 1L).cast(IntegerType), lit(win)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast(LongType))
  }

  /** Intra-document line dedup: drop every repeat of a line WITHIN its
    * document, keeping the first occurrence in original order — the
    * boilerplate-removal pass (repeated nav/footer/cookie lines on a
    * crawled page) that runs before any corpus-wide dedup, and the
    * within-doc complement to [[graft.ops.DedupOps.segmentDedup]]
    * (corpus-wide keep-first). Pure per-row HOF — zero shuffle, no
    * state: a line survives iff its FIRST index in the doc's line
    * array is its own (array_position is 1-based, the filter lambda's
    * index 0-based). O(lines²) compares per doc, fine for real page
    * line counts; corpus-scale cost is linear in rows. */
  def dedupLinesWithinDoc(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, (l, i) => array_position(lines, l) === i + 1)
    df.withColumn("n_lines", size(lines).cast(LongType))
      .withColumn("n_lines_kept", size(kept).cast(LongType))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** Shuffled LINEAR-scale twin of [[dedupLinesWithinDoc]] for
    * long-document corpora. The in-plan HOF form runs an
    * `array_position` scan per line — O(lines²) per doc, bounded for
    * C4-shaped web pages but a single-task straggler on crawl
    * pathologies (a 100k-line doc is 10¹⁰ comparisons in one row).
    * This form explodes to (id, pos, line), keeps min-pos per
    * (id, line) — map-side combinable, so corpus-wide repeats collapse
    * before the exchange — and rebuilds each doc ordered by position:
    * two shuffles, O(lines log lines) per doc, per-doc state bounded by
    * the doc's own DISTINCT line count. Same output contract
    * (`n_lines`, `n_lines_kept`, `clean_text` appended; other columns
    * preserved via the join back). Requires unique non-null `idCol` —
    * the HOF form needs no id at all, which is why both exist. */
  def dedupLinesWithinDocScalable(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
    val rebuilt = exploded
      .groupBy(col(idCol), col("_line")).agg(min(col("_pos")).as("_pos"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_line")))),
          s => s.getField("_line")), "\n").as("clean_text"))
    // LEFT join: a NULL-text row explodes to no lines and would vanish
    // under an inner join, where the HOF twin keeps it with NULL
    // n_lines/n_lines_kept/clean_text — the left join's natural nulls
    // reproduce exactly that (equivalence test carries a null fixture)
    df.withColumn("n_lines", size(split(col(textCol), "\n")).cast(LongType))
      .join(rebuilt, Seq(idCol), "left")
  }

  /** Unigram language-model scoring: per-doc mean negative log
    * probability of its tokens under the CORPUS unigram distribution —
    * the cheap seam of perplexity-based quality filtering (docs scoring
    * far from the corpus LM are boilerplate/noise; CCNet-style
    * pipelines bucket on exactly this statistic before training).
    * Additive smoothing `smoothing` over the corpus vocabulary.
    *
    * Scale shape: token-count aggregate (map-side combinable, result =
    * |vocab| rows), corpus total + vocab size via a 1-ROW aggregate
    * broadcast-cross-joined back onto the vocab (no empty-frame window:
    * `Window.partitionBy()` would funnel the whole vocab — 10⁸–10⁹
    * distinct tokens on a web corpus — through one task), log-probs
    * joined back to an exploded token stream, one partial-agg shuffle
    * on the doc id. The vocab-side join carries NO broadcast hint: at
    * test scale AQE broadcasts it anyway (the corpus text then shuffles
    * nowhere), and a web-scale vocab that exceeds the broadcast limit
    * degrades to a shuffle join instead of failing — NOTE that this
    * degraded path shuffles the exploded TOKEN STREAM on `_tok`, one
    * corpus-scale exchange the broadcast path avoids; it is the
    * graceful-degradation trade, not the steady-state plan.
    * Per-token log-probs are cast to DECIMAL(20,9) before summation so
    * the per-doc sum is order-independent and cross-engine exact (a
    * 1-ulp libm ln() disagreement dies at the 9th decimal; the mean is
    * one double division at the end). */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      smoothing: Double = 0.5): DataFrame = {
    // Deliberately NOT unigramScoreWith(df, …, unigramLmFit(df, …)):
    // semantically identical on the fit corpus (pinned by the
    // frozen-vs-in-plan equality unit test), but the composed form pays
    // an extra corpus-scale token aggregation at runtime — the OOV-row
    // filter over the model union cannot be pruned statically, so the
    // fit subtree evaluates twice (measured 2× on corpus_prep_e2e).
    // The fused body keeps the in-plan variant single-pass; the
    // fit/score split exists for FROZEN models, where the model side is
    // a small reloaded table and the double scan is free.
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val toks = df.select(col(idCol), explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val vocab = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
    val totals = vocab.agg(
      sum(col("_cnt")).as("_total"), count(lit(1)).as("_v"))
    val logProbs = vocab.crossJoin(broadcast(totals))
      .select(col("_tok"),
        log((col("_cnt") + lit(smoothing)) /
          (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 9)).as("_lp"))
    toks.join(logProbs, Seq("_tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_lp")).as("sum_logprob"))
      .withColumn("mean_neg_logprob",
        round(-col("sum_logprob").cast(DoubleType) / col("n_tokens"), 6))
  }

  /** FIT half of the unigram LM — the frozen-model artifact
    * ([[SimilarityOps]]' IVF fit/query pattern applied to quality
    * scoring): one small frame of (`_tok`, `_lp`) log-probs over the
    * fit corpus, plus ONE null-token row carrying the OOV log-prob
    * (`log(smoothing / (total + smoothing·V))` — the additive-smoothing
    * mass an unseen token receives). The whole model is
    * vocabulary-sized and plain columnar, so it persists to parquet and
    * reloads anywhere — in particular into a STREAMING scorer, where
    * fitting per micro-batch would drift with every batch and re-judge
    * old docs under new statistics. */
  def unigramLmFit(df: DataFrame, textCol: String,
      smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val toks = df.select(explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val vocab = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
    val totals = vocab.agg(
      sum(col("_cnt")).as("_total"), count(lit(1)).as("_v"))
    vocab.crossJoin(broadcast(totals))
      .select(col("_tok"),
        log((col("_cnt") + lit(smoothing)) /
          (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 9)).as("_lp"))
      .unionByName(totals.select(
        lit(null).cast(StringType).as("_tok"),
        log(lit(smoothing) / (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 9)).as("_lp")))
  }

  /** SCORE half: per-doc mean negative log prob under a FROZEN
    * [[unigramLmFit]] model — the model frame is the ONLY statistic
    * consulted, so the same doc scores identically whether the model
    * was fit yesterday, persisted, and reloaded, or built in this plan
    * (the [[unigramLogProb]] composition). Tokens outside the model
    * vocabulary take the model's OOV row via the left join + coalesce.
    * The vocab-side join carries NO broadcast hint: at test scale AQE
    * broadcasts it anyway (the corpus text then shuffles nowhere), and
    * a web-scale vocab that exceeds the broadcast limit degrades to a
    * shuffle join of the exploded token stream instead of failing —
    * the graceful-degradation trade, not the steady-state plan. The
    * 1-row OOV side IS hint-broadcast (it can never be big). */
  def unigramScoreWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val toks = df.select(col(idCol), explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val vocabLp = model.filter(col("_tok").isNotNull)
    val oovLp = model.filter(col("_tok").isNull)
      .select(col("_lp").as("_oov_lp"))
    toks.join(vocabLp, Seq("_tok"), "left")
      .crossJoin(broadcast(oovLp))
      .withColumn("_lp", coalesce(col("_lp"), col("_oov_lp")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_lp")).as("sum_logprob"))
      .withColumn("mean_neg_logprob",
        round(-col("sum_logprob").cast(DoubleType) / col("n_tokens"), 6))
  }

  /** Sentence-start marker for the bigram LM: U+0001 cannot come out of
    * whitespace tokenization of text (control chars don't survive any
    * sane extraction stage upstream), and is restatable cross-engine
    * (`chr(1)`). Reserved by contract: a corpus token equal to it would
    * alias the BOS context. */
  private val Bos = "\u0001"

  /** Per-doc (prev, token) bigram pairs with a BOS first context —
    * built BEFORE the explode (one `transform` over the token array, no
    * per-pair re-access of the parent row), so the explode emits
    * exactly n pairs for an n-token doc. */
  private def bigramPairs(toks: Column): Column =
    transform(toks, (w, i) =>
      struct(
        when(i === 0, lit(Bos)).otherwise(element_at(toks, i)).as("_prev"),
        w.as("_tok")))

  /** FIT half of a bigram LM with STUPID BACKOFF (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the web-scale
    * smoothing: no discounting, unseen bigrams fall back to a
    * constant-scaled unigram probability). The quality-scoring upgrade
    * of [[unigramLmFit]]: perplexity under a context-aware model
    * separates fluent text from token soup far better than unigram
    * frequency, and CCNet-style pipelines bucket on exactly this
    * statistic. One model frame, three row shapes:
    *
    *  - (`_prev`, `_tok`, `_lp`): ML bigram log-prob ln(c(prev,w)/c(prev)),
    *    `_prev` = U+0001 for sentence-start contexts;
    *  - (null, `_tok`, `_lp`): backoff row ln(α·(c(w)+s)/(T+s·V)) —
    *    α-scaled additive-smoothed unigram;
    *  - (null, null, `_lp`): OOV row ln(α·s/(T+s·V)).
    *
    * Log-probs are quantized DECIMAL(20,9) ONCE at fit (the
    * [[unigramLmFit]] discipline: a 1-ulp libm ln() disagreement dies
    * at the 9th decimal; per-doc sums are then order-independent exact
    * decimal adds). Scale shape: pair explode → one (prev,w) count
    * aggregation; prev totals derive from the bigram counts (one more
    * vocab-sized groupBy, never a second corpus pass); the model is
    * bigram-vocabulary-sized, plain columnar, persists to parquet and
    * reloads into [[bigramScoreWith]] — the frozen fit/score contract
    * of [[ClassifyOps]] and [[graft.ops.SearchOps]]. */
  def bigramLmFit(df: DataFrame, textCol: String,
      smoothing: Double = 0.5, backoff: Double = 0.4): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    require(backoff > 0.0 && backoff <= 1.0,
      s"backoff must be in (0, 1], got $backoff")
    val toksD = df
      .select(filter(tokenize(col(textCol)), t => length(t) > 0).as("_toks"))
      .filter(size(col("_toks")) > 0)
    val pairs = toksD
      .select(explode(bigramPairs(col("_toks"))).as("_p"))
      .select(col("_p._prev").as("_prev"), col("_p._tok").as("_tok"))
    val cb = pairs.groupBy(col("_prev"), col("_tok"))
      .agg(count(lit(1)).as("_cb"))
    val cp = cb.groupBy(col("_prev")).agg(sum(col("_cb")).as("_cp"))
    val bigramRows = cb.join(cp, Seq("_prev"))
      .select(col("_prev"), col("_tok"),
        log(col("_cb").cast(DoubleType) / col("_cp"))
          .cast(DecimalType(20, 9)).as("_lp"))
    val uni = pairs.groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
    val totals = uni.agg(sum(col("_cnt")).as("_total"), count(lit(1)).as("_v"))
    val uniRows = uni.crossJoin(broadcast(totals))
      .select(lit(null).cast(StringType).as("_prev"), col("_tok"),
        log(lit(backoff) * (col("_cnt") + lit(smoothing)) /
            (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 9)).as("_lp"))
    val oovRow = totals.select(
      lit(null).cast(StringType).as("_prev"),
      lit(null).cast(StringType).as("_tok"),
      log(lit(backoff) * lit(smoothing) /
          (col("_total") + lit(smoothing) * col("_v")))
        .cast(DecimalType(20, 9)).as("_lp"))
    bigramRows.unionByName(uniRows).unionByName(oovRow)
  }

  /** Materialize a model frame ONLY when it is a composed plan: a
    * frame that is already a single leaf relation (a frozen model
    * reloaded from parquet, a localCheckpoint, a local fixture)
    * re-evaluates trivially under multiple row-shape filters, and
    * checkpointing it per call would copy model-sized state every
    * invocation — per MICRO-BATCH in a streaming tier. A composed
    * in-plan fit, by contrast, would re-run its corpus-scale subtree
    * under each filter without the barrier. */
  private[ops] def materializeUnlessLeaf(model: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, SubqueryAlias}
    // strip name wrappers first: spark.table("m") / df.as("m") analyze
    // to SubqueryAlias(LogicalRelation) — still a frozen leaf for cost
    // purposes, and misclassifying it would re-introduce the per-call
    // copy this helper exists to avoid
    @annotation.tailrec
    def unwrap(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case a: SubqueryAlias => unwrap(a.child)
      case other => other
    }
    if (unwrap(model.queryExecution.analyzed).isInstanceOf[LeafNode]) model
    else model.localCheckpoint()
  }

  /** SCORE half: per-doc mean negative bigram log-prob under a FROZEN
    * [[bigramLmFit]] model, with stupid-backoff resolution per pair:
    * seen bigram → ML row; unseen bigram, seen word → backoff row;
    * OOV word → OOV row (one coalesce over two left joins + a 1-row
    * broadcast). `n_backoff` counts the pairs that missed the bigram
    * table — the model-coverage diagnostic a quality pipeline buckets
    * beside the perplexity itself. A COMPOSED model plan is eagerly
    * materialized once (the [[ClassifyOps.nbScoreWith]] trade —
    * otherwise the fit subtree re-evaluates per model-row-shape
    * filter); an already-frozen leaf relation is used as-is, so a
    * streaming tier scoring every micro-batch against a reloaded
    * model pays no per-batch materialization
    * ([[materializeUnlessLeaf]]).
    *
    * Scale shape: pair explode → two vocab-sized left joins (no hints:
    * AQE broadcasts them, an over-limit vocabulary degrades to a
    * shuffle join — the [[unigramScoreWith]] trade) → one partial-agg
    * shuffle on the doc id. Exact decimal sums ⇒ order-independent ⇒
    * oracle-exact. */
  def bigramScoreWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val m = materializeUnlessLeaf(model)
    val bigramRows = m.filter(col("_prev").isNotNull)
    val uniRows = m.filter(col("_prev").isNull && col("_tok").isNotNull)
      .select(col("_tok"), col("_lp").as("_lp_uni"))
    val oov = m.filter(col("_prev").isNull && col("_tok").isNull)
      .select(col("_lp").as("_oov_lp"))
    val toksD = df
      .select(col(idCol),
        filter(tokenize(col(textCol)), t => length(t) > 0).as("_toks"))
      .filter(size(col("_toks")) > 0)
    toksD
      .select(col(idCol), explode(bigramPairs(col("_toks"))).as("_p"))
      .select(col(idCol), col("_p._prev").as("_prev"), col("_p._tok").as("_tok"))
      .join(bigramRows, Seq("_prev", "_tok"), "left")
      .join(uniRows, Seq("_tok"), "left")
      .crossJoin(broadcast(oov))
      .withColumn("_plp",
        coalesce(col("_lp"), col("_lp_uni"), col("_oov_lp")))
      .withColumn("_miss",
        when(col("_lp").isNull, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_miss")).as("n_backoff"),
        sum(col("_plp")).as("sum_logprob"))
      .withColumn("mean_neg_logprob",
        round(-col("sum_logprob").cast(DoubleType) / col("n_tokens"), 6))
  }

  /** FIT half of an INTERPOLATED KNESER-NEY bigram LM (Kneser & Ney
    * 1995; Chen & Goodman 1998's interpolated form) — the standard
    * n-gram smoothing (the KenLM default) and the quality upgrade of
    * [[bigramLmFit]]'s stupid backoff: instead of scaling the unigram
    * frequency, unseen bigrams back off to the CONTINUATION probability
    * p_cont(w) = N1+(·w)/T (how many distinct contexts w follows,
    * over T bigram types) — "Francisco" is frequent but follows only
    * "San", so KN correctly scores it implausible in novel contexts,
    * the exact failure mode frequency backoff has.
    *
    * Model rows (the [[bigramLmFit]] (_prev, _tok, _lp) schema, four
    * row classes):
    *  - (v, w):      lp of the full interpolated estimate
    *                 (c(vw)−D)/c(v) + (D·N1+(v·)/c(v)) · p_cont(w)
    *  - (v, NULL):   lp of the context's backoff weight
    *                 λ(v) = D·N1+(v·)/c(v)
    *  - (NULL, w):   lp of p_cont(w) — so an unseen bigram with seen
    *                 context scores λ(v)·p_cont(w) as lp_λ + lp_cont,
    *                 an EXACT decimal add of two quantized logs
    *  - (NULL, NULL): lp of the OOV floor D/T (documented convention)
    *
    * Exactness: all counts are exact longs; the default discount
    * D = 0.75 is an exact binary fraction (the α/β-complement
    * discipline), each probability is ONE fixed IEEE chain over exact
    * inputs, and ln quantizes DECIMAL(20,9) ONCE per vocab-grain row
    * (the unigram-logprob discipline) ⇒ per-doc sums are exact decimal
    * adds, fully oracle-able.
    *
    * Scale shape: pair explode → one (v,w) count aggregation; every
    * derived table (context counts+continuation fan-outs, word
    * context counts, the 1-row type total) aggregates off that grain —
    * nothing rescans the corpus. */
  def knBigramFit(df: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val toksD = df
      .select(filter(tokenize(col(textCol)), t => length(t) > 0).as("_toks"))
      .filter(size(col("_toks")) > 0)
    val pairs = toksD
      .select(explode(bigramPairs(col("_toks"))).as("_p"))
      .select(col("_p._prev").as("_prev"), col("_p._tok").as("_tok"))
    val cb = pairs.groupBy(col("_prev"), col("_tok"))
      .agg(count(lit(1)).as("_cb"))
    // context grain: total count c(v) AND distinct-continuation count
    // N1+(v·) from one aggregation over the bigram grain
    val cp = cb.groupBy(col("_prev"))
      .agg(sum(col("_cb")).as("_cp"), count(lit(1)).as("_n1p"))
    val n1c = cb.groupBy(col("_tok")).agg(count(lit(1)).as("_n1c"))
    val tot = cb.agg(count(lit(1)).as("_t"))
    val qd = DecimalType(20, 9)
    val bi = cb.join(cp, Seq("_prev")).join(n1c, Seq("_tok"))
      .crossJoin(broadcast(tot))
      .select(col("_prev"), col("_tok"),
        log((col("_cb") - lit(discount)) / col("_cp") +
            ((lit(discount) * col("_n1p")) / col("_cp")) *
              (col("_n1c") / col("_t")))
          .cast(qd).as("_lp"))
    val lam = cp.select(col("_prev"),
      lit(null).cast(StringType).as("_tok"),
      log((lit(discount) * col("_n1p")) / col("_cp")).cast(qd).as("_lp"))
    val cont = n1c.crossJoin(broadcast(tot))
      .select(lit(null).cast(StringType).as("_prev"), col("_tok"),
        log(col("_n1c") / col("_t")).cast(qd).as("_lp"))
    val oov = tot.select(
      lit(null).cast(StringType).as("_prev"),
      lit(null).cast(StringType).as("_tok"),
      log(lit(discount) / col("_t")).cast(qd).as("_lp"))
    bi.unionByName(lam).unionByName(cont).unionByName(oov)
  }

  /** SCORE half: per-doc mean negative Kneser-Ney bigram log-prob
    * under a FROZEN [[knBigramFit]] model. Per-pair resolution, each
    * tier one coalesce arm: seen bigram → interpolated row; unseen
    * bigram, seen context AND seen word → λ(v)·p_cont(w) as the EXACT
    * decimal add lp_λ(v) + lp_cont(w); unseen context, seen word →
    * p_cont(w); OOV word → the D/T floor. `n_backoff` counts pairs
    * that missed the bigram table, `n_oov` pairs whose word has no
    * continuation row — the two coverage diagnostics. Same
    * materialize-unless-leaf, join, and exact-decimal-sum shape as
    * [[bigramScoreWith]]. */
  def knBigramScoreWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val m = materializeUnlessLeaf(model)
    val bi = m.filter(col("_prev").isNotNull && col("_tok").isNotNull)
    val lam = m.filter(col("_prev").isNotNull && col("_tok").isNull)
      .select(col("_prev"), col("_lp").as("_lp_lam"))
    val cont = m.filter(col("_prev").isNull && col("_tok").isNotNull)
      .select(col("_tok"), col("_lp").as("_lp_cont"))
    val oov = m.filter(col("_prev").isNull && col("_tok").isNull)
      .select(col("_lp").as("_lp_oov"))
    val toksD = df
      .select(col(idCol),
        filter(tokenize(col(textCol)), t => length(t) > 0).as("_toks"))
      .filter(size(col("_toks")) > 0)
    toksD
      .select(col(idCol), explode(bigramPairs(col("_toks"))).as("_p"))
      .select(col(idCol), col("_p._prev").as("_prev"), col("_p._tok").as("_tok"))
      .join(bi, Seq("_prev", "_tok"), "left")
      .join(lam, Seq("_prev"), "left")
      .join(cont, Seq("_tok"), "left")
      .crossJoin(broadcast(oov))
      .withColumn("_plp",
        coalesce(col("_lp"), col("_lp_lam") + col("_lp_cont"),
          col("_lp_cont"), col("_lp_oov")))
      .withColumn("_miss", when(col("_lp").isNull, 1L).otherwise(0L))
      .withColumn("_oovf", when(col("_lp_cont").isNull, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_miss")).as("n_backoff"),
        sum(col("_oovf")).as("n_oov"),
        sum(col("_plp")).as("sum_logprob"))
      .withColumn("mean_neg_logprob",
        round(-col("sum_logprob").cast(DoubleType) / col("n_tokens"), 6))
  }

  /** PII-style scrubbing: mask digit runs and email-shaped tokens — the
    * plan shape (regexp_replace chain, codegen'd) of a real scrub pass. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
      "\\d{4,}", "<NUM>")

  /** Stable content fingerprint (md5 hex — engine-portable). */
  /** Canonical pre-hash normalization for dedup: NFKC (composed vs
    * decomposed accents, full-width forms, ligatures, NBSP → the same
    * codepoints — see expressions.NfkcNormalize), then lower-case, then
    * whitespace collapse + trim. Run this BEFORE any content digest or
    * signature ([[fingerprintMd5]], `DedupOps.exactDedup/
    * incrementalDedup` keys): visually-identical strings that differ
    * only in encoding form otherwise hash apart and escape dedup.
    * Session-scoped because the native expression must be registered. */
  def normalizeForDedup(spark: org.apache.spark.sql.SparkSession, text: Column): Column = {
    graft.expressions.GraftFunctions.register(spark)
    trim(regexp_replace(
      lower(call_function("nfkc_normalize", text)), "\\s+", " "))
  }

  def fingerprintMd5(text: Column): Column = md5(text)

  /** 64-bit rolling (chained) hash over tokens: each step hashes
    * (token, accumulator), so the result is order-sensitive like a
    * polynomial hash but cannot overflow under ANSI mode (a Horner
    * `acc*base+h` fold would). Pure integer ops, per-row, streaming-friendly. */
  def rollingHash(text: Column): Column =
    aggregate(tokenize(text), lit(0L), (acc, t) => xxhash64(t, acc))

  /** Pairwise TOTAL-VARIATION distance between per-group unigram
    * distributions — the "which sources are lexically alike" matrix a
    * corpus-mixing decision wants next to [[vocabGrowth]]'s saturation
    * curve. TVD is chosen over KL/chi² deliberately: with counts c, d
    * and totals N, M, TVD = ½·Σ|c_t/N − d_t/M| = Σ|c_t·M − d_t·N| /
    * (2·N·M) — the numerator is an EXACT integer (summed in a decimal
    * accumulator), the result one IEEE division, so the matrix is
    * engine-exact; KL's ln() differs in the last ulp across libm
    * implementations (the repo-pinned hazard).
    *
    * Scale shape: one (group, term) aggregation over the token stream,
    * then everything is vocabulary×pairs-sized. The vocabulary is
    * capped at the global `topK` terms (count DESC, term ASC ties) with
    * the remainder lumped into `__other` — the coarsened distributions
    * keep TVD a true distance while bounding the pair grid at
    * groups²·topK regardless of corpus vocabulary. */
  def sourceDivergence(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 10000): DataFrame = {
    require(topK >= 1, s"sourceDivergence: topK must be >= 1, got $topK")
    val toks = df.select(col(groupCol).as("_g"),
        explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val kept = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_gc"))
      .orderBy(col("_gc").desc, col("_tok")).limit(topK)
      .select(col("_tok"), lit(true).as("_keep"))
    val counts = toks.join(broadcast(kept), Seq("_tok"), "left")
      .select(col("_g"),
        when(col("_keep"), col("_tok")).otherwise(lit("__other")).as("_term"))
      .groupBy(col("_g"), col("_term")).agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
    val gp = totals.as("a").crossJoin(totals.as("b"))
      .filter(col("a._g") < col("b._g"))
      .select(col("a._g").as("ga"), col("a._n").as("na"),
        col("b._g").as("gb"), col("b._n").as("nb"))
    val grid = gp.crossJoin(counts.select(col("_term")).distinct())
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    grid
      .join(counts.select(col("_g").as("ga"), col("_term"),
        col("_c").as("_ca")), Seq("ga", "_term"), "left")
      .join(counts.select(col("_g").as("gb"), col("_term"),
        col("_c").as("_cb")), Seq("gb", "_term"), "left")
      .na.fill(0L, Seq("_ca", "_cb"))
      .groupBy(col("ga"), col("gb"), col("na"), col("nb"))
      .agg(sum(abs(dec(col("_ca")) * dec(col("nb")) -
        dec(col("_cb")) * dec(col("na")))).as("_num"))
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        (col("_num").cast(DoubleType) /
          (col("na").cast(DoubleType) * col("nb").cast(DoubleType) *
            lit(2.0))).as("tvd"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Vocabulary-growth (Heaps-law) curve: for each corpus prefix
    * fraction, the token count, DISTINCT-term count and type/token
    * ratio — the "is the vocabulary still growing?" diagnostic a
    * corpus-mixing decision wants (a saturating curve means more of the
    * same source adds volume, not diversity; TTR is the standard
    * lexical-diversity statistic). Prefixes are by id order (a crawl's
    * natural arrival order), threshold = floor(fraction · (max id + 1)).
    *
    * ONE pass over the token stream: per-term `min(id)` is the term's
    * first appearance, so n_distinct at prefix P is a conditional count
    * over the TERM table (vocabulary-sized), and n_tokens at P is a
    * conditional count over the token stream — no per-prefix rescans,
    * no window. Exact integers + one IEEE division ⇒ engine-exact. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      fractions: Seq[Double] = Seq(0.25, 0.5, 0.75, 1.0)): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1),
      s"vocabGrowth: fractions must be in (0, 1], got $fractions")
    val n = df.agg((max(col(idCol)) + 1L).as("_n"))
    val toks = df.select(col(idCol).as("_id"),
        explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .crossJoin(broadcast(n))
    def thresh(f: Double): Column = (col("_n") * f).cast(LongType)
    val tokAggs = fractions.zipWithIndex.map { case (f, i) =>
      sum(when(col("_id") < thresh(f), 1L).otherwise(0L)).as(s"_t$i")
    }
    val tokCounts = toks.agg(tokAggs.head, tokAggs.tail: _*)
    val terms = toks.groupBy(col("_tok"))
      .agg(min(col("_id")).as("_first"), max(col("_n")).as("_n"))
    val termAggs = fractions.zipWithIndex.map { case (f, i) =>
      sum(when(col("_first") < thresh(f), 1L).otherwise(0L)).as(s"_d$i")
    } :+ max(col("_n")).as("_n")
    val termCounts = terms.agg(termAggs.head, termAggs.tail: _*)
    tokCounts.crossJoin(broadcast(termCounts))
      .select(explode(array(fractions.zipWithIndex.map { case (f, i) =>
        struct(lit(f).as("frac"),
          (col("_n") * f).cast(LongType).as("prefix_docs"),
          col(s"_t$i").as("n_tokens"),
          col(s"_d$i").as("n_distinct"),
          (col(s"_d$i").cast(DoubleType) / col(s"_t$i"))
            .as("type_token_ratio"))
      }: _*)).as("_r"))
      .select(col("_r.*"))
      .orderBy(col("frac"))
  }

  /** Flesch-Kincaid readability grade per document (Kincaid et al.
    * 1975): `0.39·(words/sentences) + 11.8·(syllables/words) − 15.59`,
    * the standard complexity score a quality ladder buckets on beside
    * the LM-perplexity tiers — cheap, model-free, and linguistically
    * interpretable. Syllables are the classic vowel-group
    * approximation (runs of `[aeiouy]+` — whitespace breaks runs, so
    * the whole-text count equals the per-word sum); sentences are runs
    * of `[.!?]+`, floored at 1 so a fragment scores as one sentence.
    *
    * Zero-shuffle column program: three codegen `regexp_count`/size
    * expressions and one fixed IEEE chain over the exact integer
    * counts — bit-reproducible and restatable (DuckDB:
    * `len(regexp_extract_all(...))`). Documents with zero words yield
    * NULL grade (no 0/0), keeping the row as quarantineable data.
    * Output: (idCol, n_words, n_sentences, n_syllables, fk_grade). */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(tokenize(col(textCol)), t => length(t) > 0)
    val words = size(toks).cast(LongType)
    val sentences = greatest(
      regexp_count(col(textCol), lit("[.!?]+")), lit(1)).cast(LongType)
    val syllables = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
      .cast(LongType)
    val wD = col("n_words").cast(DoubleType)
    val sD = col("n_sentences").cast(DoubleType)
    val yD = col("n_syllables").cast(DoubleType)
    df.select(col(idCol), words.as("n_words"), sentences.as("n_sentences"),
        syllables.as("n_syllables"))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          lit(0.39) * (wD / sD) + lit(11.8) * (yD / wD) - lit(15.59)))
  }

  /** Zipf-law fit of the token frequency distribution: OLS slope of
    * ln(freq) on ln(rank) over the corpus's top-`topK` terms — the
    * third corpus-shape diagnostic beside [[vocabGrowth]] (lexical
    * saturation) and [[sourceDivergence]] (inter-source similarity). A
    * natural corpus sits near slope ≈ −1 (Zipf 1949); boilerplate- or
    * template-heavy corpora flatten the head (slope > −0.7-ish),
    * near-duplicate floods steepen it — a one-number tripwire for a
    * distribution-level corruption no per-doc filter sees.
    *
    * Determinism: raw ln() in a DOUBLE output is the repo-pinned libm
    * last-ulp hazard ([[sourceDivergence]]'s TVD-over-KL note), so
    * each ln is quantized ONCE to the 1e-6 integer grid (the
    * [[ClassifyOps.nbFit]] contract) and the whole OLS normal-equation
    * algebra — Σx, Σy, Σxy, Σx² and the two determinant products —
    * runs in exact integers/decimals; slope and intercept are each ONE
    * IEEE division/chain over exact-valued doubles at the very end.
    *
    * Scale shape: one (token) aggregation (the 100 TB shuffle),
    * a bounded-heap global top-k (TakeOrderedAndProject — topK rows
    * out), then all ranking/regression on ONE row via a sorted array —
    * no partition-less window, no second scan. Output (one row):
    * (`n_terms`, `slope`, `intercept`). With fewer than 2 distinct
    * x-ranks the determinant is 0 and slope divides to NaN/±Inf —
    * identically on both engines; callers gate on n_terms. */
  def zipfSlope(df: DataFrame, textCol: String, topK: Int = 200): DataFrame = {
    require(topK >= 3, s"zipfSlope: topK must be >= 3, got $topK")
    // ln value quantized to the 1e-6 grid as an exact BIGINT
    def q6(c: Column): Column =
      (c.cast(DecimalType(12, 6)) * lit(1000000)).cast(LongType)
    val top = df.select(explode(tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("_tok")).limit(topK)
    // (-count, token) sorts ascending = (count DESC, token ASC):
    // the rank order, recovered positionally from ONE sorted array
    val folded = top
      .agg(sort_array(collect_list(struct(
        (-col("_cnt")).as("nc"), col("_tok").as("t"), col("_cnt").as("c"))))
        .as("_a"))
      .select(size(col("_a")).cast(LongType).as("_k"),
        transform(col("_a"), (_, i) =>
          q6(log((i + lit(1)).cast(DoubleType)))).as("_xs"),
        transform(col("_a"), (e, _) =>
          q6(log(e("c").cast(DoubleType)))).as("_ys"))
    def asum(a: Column): Column = aggregate(a, lit(0L), (acc, v) => acc + v)
    // Σxy/Σx² accumulate in DECIMAL(38,0): per-term x·y ≤ ~4.6e14 fits
    // a long, but the SUM passes 2⁶³ once topK · q6(ln topK) ·
    // q6(ln N) > 9.2e18 — at 100 TB token counts (ln N ≈ 33) that is
    // topK ≈ 2e4, well inside a realistic top-k sweep. The decimal
    // path is exact to topK ~1e6 (Σ ≤ ~4.6e20 ≪ 10³⁸); same integers
    // where both are exact, so the hash is unchanged.
    def asumDec(a: Column): Column = aggregate(a,
      lit(0L).cast(DecimalType(38, 0)),
      (acc, v) => (acc + v).cast(DecimalType(38, 0)))
    val sums = folded.select(col("_k"),
      asum(col("_xs")).as("_sx"), asum(col("_ys")).as("_sy"),
      asumDec(zip_with(col("_xs"), col("_ys"), (x, y) => x * y)).as("_sxy"),
      asumDec(zip_with(col("_xs"), col("_xs"), (x, y) => x * y)).as("_sxx"))
    // normal equations over exact decimals (Σx, Σy ≤ topK·q6(ln N) ≤
    // ~3.3e13 at topK 1e6 → the d19 products cap under 10³⁸)
    def d19(c: Column): Column = c.cast(DecimalType(19, 0))
    val num = col("_k").cast(DecimalType(6, 0)) * col("_sxy") -
      d19(col("_sx")) * d19(col("_sy"))
    val den = col("_k").cast(DecimalType(6, 0)) * col("_sxx") -
      d19(col("_sx")) * d19(col("_sx"))
    sums
      .withColumn("slope", num.cast(DoubleType) / den.cast(DoubleType))
      .select(col("_k").as("n_terms"), col("slope"),
        ((col("_sy").cast(DoubleType) / lit(1.0e6) -
          col("slope") * (col("_sx").cast(DoubleType) / lit(1.0e6))) /
          col("_k").cast(DoubleType)).as("intercept"))
  }

  /** Code-vs-prose router features + decision: the training-data stage
    * that splits a mixed crawl into code and natural-language streams
    * (each goes to a different filtering/tokenization pipeline — C4
    * rules DESTROY code, code filters starve prose). Pure zero-shuffle
    * column program over exact counts:
    *
    *  - `n_code_symbols`: {}();=[] occurrences (brace-language surface)
    *  - `n_keywords`: word-boundary hits of a fixed keyword set
    *    (def/return/import/class/void/const/function/var)
    *  - `symbol_ratio`, `keyword_ratio`: each ONE IEEE division by
    *    char/word count
    *  - `is_code`: symbol_ratio ≥ 0.03 AND n_keywords ≥ 1, OR
    *    symbol_ratio ≥ 0.08 — the two-path rule (keyword-confirmed low
    *    symbol density, or unambiguous symbol density alone)
    *
    * The regexes are RE2-compatible (no lookarounds), so a SQL oracle
    * replays them verbatim. */
  def codeDetect(text: Column): (Column, Column, Column, Column, Column) = {
    val nChars = length(text)
    val toks = tokenize(text)
    val nWords = size(filter(toks, t => length(t) > 0))
    val nSym = size(regexp_extract_all(text, lit("[{}();=\\[\\]]"), lit(0)))
    val nKw = size(regexp_extract_all(lower(text),
      lit("\\b(def|return|import|class|void|const|function|var)\\b"), lit(0)))
    val symRatio = when(nChars > 0,
      nSym.cast(DoubleType) / nChars.cast(DoubleType)).otherwise(lit(0.0))
    val kwRatio = when(nWords > 0,
      nKw.cast(DoubleType) / nWords.cast(DoubleType)).otherwise(lit(0.0))
    val isCode = ((symRatio >= 0.03 && nKw >= 1) || symRatio >= 0.08)
      .cast(org.apache.spark.sql.types.IntegerType)
    (nSym.cast(org.apache.spark.sql.types.LongType),
      nKw.cast(org.apache.spark.sql.types.LongType), symRatio, kwRatio, isCode)
  }

  /** CCNet-style perplexity split (Wenzek et al. 2020): rank the corpus
    * by a per-doc LM score (mean negative log-prob — lower = more
    * fluent) and cut it into the head / middle / tail TERCILES that the
    * CCNet pipeline routes differently (keep head, maybe-keep middle,
    * drop or re-filter tail). The bucket edges are EXACT integer rank
    * arithmetic (rank·3 div N over the (score ASC, id) total order —
    * the curriculumSample contract; value-quantile edges would hang
    * membership on a cross-engine ulp), with the global rank a
    * range-sort + zipWithIndex, never a partition-less window.
    *
    * Determinism: the score column is expected on the 1e-6 grid
    * (knBigramScoreWith's rounded mean_neg_logprob) so the DECIMAL(12,6)
    * cast is exact and the per-bucket mean is ONE IEEE division of an
    * exact decimal sum; min/max are order-free. Output grain: 3 rows.
    */
  def ccnetSplit(scored: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String): DataFrame = {
    // materialize the per-doc projection ONCE: it feeds both the rank
    // sort and the total count, and the caller's `scored` is typically
    // an expensive LM-scoring subtree that must not run twice (the
    // self-review double-scan class; measured ~2x on the CCNet key)
    val base = scored.select(col(idCol).as("_id"), col(scoreCol).as("_s"),
        col(tokensCol).as("_tok"))
      .localCheckpoint()
    val ranked = SampleOps.zipPositions(
      base.orderBy(col("_s"), col("_id")), "_rank")
    ranked
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_n"))))
      .withColumn("bucket_idx",
        expr("(_rank * 3) div _n").cast(IntegerType))
      .groupBy(col("bucket_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tok").cast(LongType)).as("n_tokens"),
        sum(col("_s").cast(DecimalType(12, 6))).as("_sum_s"),
        min(col("_s")).as("min_nll"),
        max(col("_s")).as("max_nll"))
      .select(
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          col("bucket_idx") + 1).as("bucket"),
        col("bucket_idx"), col("n_docs"), col("n_tokens"),
        (col("_sum_s").cast(DoubleType) / col("n_docs").cast(DoubleType))
          .as("mean_nll"),
        col("min_nll"), col("max_nll"))
      .orderBy(col("bucket_idx"))
  }
}

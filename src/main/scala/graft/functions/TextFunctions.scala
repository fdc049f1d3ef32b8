package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language id, quality scoring, token counting, fingerprinting. All are
  * pure Catalyst built-ins (codegen'd, no UDFs) so they run inside
  * whole-stage codegen over 100 TB-class text scans.
  */
object TextFunctions {

  /** Whitespace tokens. Documents use single-space separation; for general
    * text use `bpeishTokens`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Accent stripping — NFD with combining marks dropped (é → e, ü → u;
    * ß/ø/æ pass through: letters, not accents). Codegen'd
    * [[graft.expressions.StripAccents]]; DuckDB twin: `strip_accents`
    * (utf8proc, same NFD semantics — parity pinned by q_text_fold). */
  def stripAccents(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expressions.StripAccents(
      org.apache.spark.sql.GraftBridge.expression(text)))

  /** FUZZY-MATCH fold key: NFC-compose, strip accents, Unicode-lowercase,
    * collapse whitespace — the canonical key under which "Hanwëlla  " from
    * a degraded feed equi-joins the dimension's "Hanwella" (the S5
    * station-name class) and near-dup titles bucket together before edit
    * distance. All codegen'd maps; DuckDB twin:
    * `trim(regexp_replace(lower(strip_accents(nfc_normalize(t))), '\s+', ' ', 'g'))`. */
  def foldForMatch(text: Column): Column =
    trim(regexp_replace(lower(stripAccents(unicodeNfc(text))), "\\s+", " "))

  /** Unicode NFC normalization (codegen'd [[graft.expressions.UnicodeNfc]];
    * DuckDB twin: `nfc_normalize`). */
  def unicodeNfc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.expressions.UnicodeNfc(
      org.apache.spark.sql.GraftBridge.expression(text)))

  /** Canonical text for content hashing: NFC-compose (é arriving as e +
    * combining accent must hash like composed é), Unicode-lowercase,
    * collapse whitespace runs to one space, trim. The byte-identity layer
    * under exact/MinHash dedup — without it the same document from two
    * producers dedupes as two. Every step is engine-portable (DuckDB:
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`). */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(unicodeNfc(text)), "\\s+", " "))

  /** URL canonicalization — the key-normalization layer URL-keyed dedup
    * needs (the same landing page arrives as `HTTP://Site.com/a/?b=2&
    * utm_source=feed#top` and `http://site.com/a?b=2`): lowercase the
    * scheme://host prefix (paths stay case-sensitive), strip the
    * fragment, drop default ports (:80 http, :443 https), strip
    * trailing path slashes, drop tracking params (utm_*, fbclid,
    * gclid) and SORT the survivors so param order cannot split a key.
    * Pure codegen'd expression chain (regex + array ops on the
    * query-string split) — zero shuffle at any corpus size, and every
    * step has a DuckDB twin (regexp + list functions) so normalized
    * keys replay exactly. Non-URL strings pass through lightly touched
    * (no scheme prefix → nothing matches the host rules). */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // scheme://authority prefix, lowercased; the path keeps its case
    val pre = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    val preLower = lower(pre)
    val preNoPort = regexp_replace(
      regexp_replace(preLower, "^(https://[^/:]*):443$", "$1"),
      "^(http://[^/:]*):80$", "$1")
    val path = regexp_replace(
      base.substr(length(pre) + 1, length(base)), "/+$", "")
    val kept = array_join(array_sort(filter(split(query, "&", -1),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)") && p =!= "")), "&")
    concat(preNoPort, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Exact whitespace token count without array materialization — cheap
    * enough for a first-pass quality filter over petabyte text. */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(length(text) - length(replace(text, lit(" "), lit(""))) + lit(1))
      .cast("long")

  /** BPE-ish lexical tokens: letter runs, digit runs, single punctuation. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Sentence-boundary regex: terminal punctuation, whitespace, then an
    * uppercase letter. Deliberately RE2-COMPATIBLE (no lookarounds —
    * RE2/DuckDB rejects them) so any SQL engine replays the exact split:
    * the boundary whitespace is REPLACED by a \\u0001 sentinel
    * (backreference replacement, supported by both regex families) and the
    * split runs on the sentinel. The abbreviation problem ("Dr. Smith") is
    * accepted rule-based-splitter behavior, same as spaCy's sentencizer. */
  private val SentenceBoundary = "([.!?])\\s+(\\p{Lu})"

  /** Text with sentence boundaries marked by the \\u0001 sentinel (the shared base of
    * [[sentences]] and [[sentenceStats]] — one regexp pass, codegen'd). */
  private def sentenceMarked(text: Column): Column =
    regexp_replace(text, SentenceBoundary, "$1\u0001$2")

  /** Rule-based sentence segmentation: array of sentences in order.
    * NULL text → NULL; a text with no boundary is one sentence. */
  def sentences(text: Column): Column =
    split(sentenceMarked(text), "\u0001")

  /** Per-doc sentence statistics WITHOUT array materialization or HOF
    * lambdas: the sentinel replacement drops exactly the boundary
    * whitespace, so n = \u0001 count + 1 and the summed sentence length
    * is length(marked) − (n − 1) — mean sentence chars from two lengths
    * and a count, fully codegen'd. Returns a struct
    * (n_sentences, mean_sentence_chars). */
  def sentenceStats(text: Column): Column = {
    val marked = sentenceMarked(text)
    val n = (length(marked) - length(replace(marked, lit("\u0001"), lit("")))
      + lit(1)).cast("long")
    struct(
      n.as("n_sentences"),
      round((length(marked).cast("double") - (n - 1)) / n, 2)
        .as("mean_sentence_chars"))
  }

  /** Flesch-STYLE reading-ease score: 206.835 − 1.015·(words/sentence) −
    * 84.6·(syllables/word), with syllables approximated as VOWEL GROUPS
    * (runs of [aeiouy], case-insensitive) — the standard cheap proxy; a
    * vowel-less token contributes 0, so this is Flesch-style, not
    * dictionary Flesch. Sentences via [[sentenceStats]], words via
    * [[tokenCount]], groups via `regexp_count` — all codegen'd, and every
    * piece has a DuckDB twin (`len(regexp_extract_all(...))`) so the score
    * replays bit-for-bit after the shared round. Empty text scores an
    * explicit 0.0 (same guard rationale as [[qualityScore]]). */
  def readabilityScore(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sents = sentenceStats(text).getField("n_sentences").cast("double")
    val syl = regexp_count(text, lit("[aeiouyAEIOUY]+")).cast("double")
    when(length(text) === 0, lit(0.0))
      .otherwise(round(
        lit(206.835) - lit(1.015) * (words / sents)
          - lit(84.6) * (syl / words), 2))
  }

  /** Occurrences of a marker word among space-separated tokens (exact token
    * semantics via a higher-order filter — no array shuffle, stays in
    * codegen). */
  def wordHits(text: Column, word: String): Column =
    size(filter(tokens(text), w => w === word)).cast("long")

  /** One-pass count of tokens belonging to a word set. */
  def wordSetHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words: _*))).cast("long")

  /** Stopword lists per language for the n-gram/stopword lang-id heuristic. */
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "is", "in")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht")
  val StopwordsFr = Seq("le", "la", "les", "et", "est", "dans")
  val StopwordsEs = Seq("el", "la", "los", "y", "es", "en")

  private def hitsFor(text: Column, words: Seq[String]): Column =
    wordSetHits(text, words)

  /** Language-ID heuristic: stopword evidence per candidate language, argmax
    * with deterministic tiebreak (en > de > fr > es > und). */
  def langIdHeuristic(text: Column): Column = {
    val en = hitsFor(text, StopwordsEn)
    val de = hitsFor(text, StopwordsDe)
    val fr = hitsFor(text, StopwordsFr)
    val es = hitsFor(text, StopwordsEs)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(fr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Document quality score in [0,1]: blends token-length sanity, stopword
    * density and punctuation density — the usual cheap pre-filter before
    * expensive dedup/classification stages. An EMPTY document scores an
    * explicit 0.0: without the guard, Spark's non-ANSI division yields NULL
    * where other engines produce inf/nan paths — a silent cross-engine
    * divergence waiting for the first empty row. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val avgTokLen = (nChars - (nTok - 1)) / nTok
    val stopRatio = hitsFor(text, StopwordsEn).cast("double") / nTok
    val punct = (length(text) - length(translate(text, ".,!?;", ""))).cast("double")
    val punctRatio = punct / nChars
    val lenScore = when(avgTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    val punctScore = when(punctRatio <= 0.1, 1.0).otherwise(0.5)
    when(nChars === 0, lit(0.0))
      .otherwise(lenScore * 0.4 + stopScore * 0.4 + punctScore * 0.2)
  }

  /** Whole-document fingerprint: sha256 of the lower-cased text. */
  def fingerprint(text: Column): Column = sha2(lower(text), 256)

  /** Per-document token-repetition metrics (the Gopher-style repetition
    * quality filters): given a (id, token) exploded frame, returns one row
    * per id with `n_tokens`, `n_distinct`, `type_token_ratio` and
    * `top_token_fraction` — machine-generated/boilerplate text shows a low
    * type-token ratio and a high top-token fraction. Two hash aggregations
    * (map-side partials apply), shuffle carries (id, token) then id —
    * never document bodies; ratios round to 6 places for cross-engine
    * float compare. */
  def repetitionMetrics(tokens: DataFrame, idCol: String,
      tokCol: String): DataFrame = {
    val perTok = tokens.groupBy(col(idCol), col(tokCol))
      .agg(count(lit(1)).as("__c"))
    perTok.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      round(count(lit(1)) / sum(col("__c")), 6).as("type_token_ratio"),
      round(max(col("__c")) / sum(col("__c")), 6).as("top_token_fraction"))
  }

  /** Duplicate-LINE repetition metrics (the Gopher repetition rules'
    * line-level member, complementing [[repetitionMetrics]]' token-level
    * TTR/top-fraction): per doc, the fraction of line OCCURRENCES whose
    * content appears more than once in the doc, and the same fraction
    * char-weighted — the listy/boilerplate signal ("fraction of
    * characters in duplicate lines", Rae et al. 2021 A1.1). Lines split
    * on `sep`, trimmed, empties dropped; a doc with no surviving lines
    * measures explicit 0.0 (the [[qualityScore]] empty-doc rationale).
    *
    * Scale shape: one (doc, line-hash) hash aggregate with map-side
    * partials + one per-doc aggregate — the shuffle carries line digests
    * and counts, never bodies; nothing pairwise. */
  def duplicateLineMetrics(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .as("__l"))
      .withColumn("__l", trim(col("__l")))
      .filter(length(col("__l")) > 0)
    val perLine = lines
      .groupBy(col(idCol), sha2(col("__l"), 256).as("__h"))
      .agg(count(lit(1)).as("__c"), first(length(col("__l"))).as("__len"))
    val tot = perLine.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_lines"),
      coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L)).as("__dl"),
      sum(col("__len") * col("__c")).as("__ch"),
      coalesce(sum(when(col("__c") > 1, col("__len") * col("__c"))), lit(0L))
        .as("__dch"))
    df.select(col(idCol)).join(tot, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        round(coalesce(col("__dl") / col("n_lines"), lit(0.0)), 6)
          .as("dup_line_frac"),
        round(coalesce(col("__dch") / col("__ch"), lit(0.0)), 6)
          .as("dup_char_frac"))
  }

  /** The Gopher REPETITION gate (Rae et al. 2021, A1.1 repetition rows):
    * a doc passes when its duplicate-line fraction ≤ 0.30, its
    * duplicate-line CHARACTER fraction ≤ 0.20, and its top 2/3/4-gram
    * character fractions ≤ 0.20 / 0.18 / 0.16 — the thresholds the paper
    * publishes. Metric semantics are identical to
    * [[duplicateLineMetrics]] (line layer, split on `lineSep`) and
    * [[graft.trainprep.TrainPrep.topNgramMetrics]] (n ∈ {2,3,4}); all
    * metrics ride along in the output so a caller can audit WHICH rule
    * failed.
    *
    * Scale shape — ONE text scan (this is the r11-judge fusion): instead
    * of composing the four metric operators (which scanned the corpus
    * text four times — at 100 TB, 4× the dominant cost), a single select
    * explodes every metric's units at once as kind-tagged strings
    * ("L line", "2 bigram", …, plus one "D " presence marker per doc so
    * empty docs survive to the output), and the rest is one
    * STRAIGHT-LINE chain with no self-joins: an (id, kind, unit-key)
    * hash aggregate counts units, an (id, kind) window ranks each kind's
    * top unit, and a final per-doc conditional aggregate derives every
    * metric at once. One consumer per node matters: the naive "share the
    * counts frame across branch aggregates" form does NOT stay shared —
    * Catalyst pushes each branch's kind-filter below the common
    * aggregate, the exchanges stop being equal, and exchange reuse dies
    * (measured: 3 full text scans). Lines shuffle as sha256 digests +
    * lengths (never bodies); n-grams shuffle raw (bounded at n ≤ 4 words
    * — needed for the deterministic lexicographic tiebreak and the
    * char-fraction length); nothing is pairwise; all three shuffles are
    * linear in corpus tokens, never in text bytes. */
  def repetitionGate(df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = col("__toks")
    val emptyArr = array().cast("array<string>")
    def gramUnits(n: Int): Column = {
      val nSh = size(toks) - (n - 1)
      // sequence(1, 0) is the DESCENDING [1, 0], not empty — short docs
      // must be guarded to emit no shingles (the ngramShingles convention)
      coalesce(
        when(nSh > 0, transform(sequence(lit(1), nSh),
          i => concat(lit(s"$n "), concat_ws(" ", slice(toks, i, lit(n)))))),
        emptyArr)
    }
    val lineUnits = coalesce(
      filter(
        transform(split(col(textCol), java.util.regex.Pattern.quote(lineSep), -1),
          l => concat(lit("L "), trim(l))),
        l => length(l) > 2),
      emptyArr)
    val units = df
      .select(col(idCol), length(col(textCol)).as("__chars"),
        split(col(textCol), " ").as("__toks"), col(textCol))
      .select(col(idCol), col("__chars"),
        explode(concat(array(lit("D ")), lineUnits,
          gramUnits(2), gramUnits(3), gramUnits(4))).as("__s"))
      .select(col(idCol), col("__chars"),
        col("__s").substr(lit(1), lit(1)).as("__k"),
        col("__s").substr(lit(3), length(col("__s"))).as("__u"))
    // first shuffle: (id, kind, unit-key) count aggregate. Line bodies
    // leave the mappers as digests; the kind rides the key so a line and
    // an identical-looking n-gram can never pool.
    val counts = units
      .groupBy(col(idCol), col("__k"),
        when(col("__k") === "L", sha2(col("__u"), 256))
          .otherwise(col("__u")).as("__key"))
      .agg(count(lit(1)).as("__c"), first(length(col("__u"))).as("__len"),
        first(col("__chars")).as("__chars"))
    // (id, kind) window over the counts — the "D" and "L" rows ride along
    // harmlessly (their rank is never read); one extra small shuffle beats
    // un-sharing the scan
    val ranked = counts.withColumn("__rn", row_number().over(
      Window.partitionBy(col(idCol), col("__k"))
        .orderBy(col("__c").desc, col("__key").asc)))
    val isLine = col("__k") === "L"
    val topFrac = round(least(lit(1.0),
      col("__c") * col("__len") / col("__chars")), 6)
    def topOf(n: Int): Column = coalesce(
      max(when(col("__k") === n.toString && col("__rn") === 1, topFrac)),
      lit(0.0))
    val dupLineFrac = round(
      coalesce(sum(when(isLine && col("__c") > 1, col("__c"))), lit(0L)) /
        sum(when(isLine, col("__c"))), 6)
    val dupCharFrac = round(
      coalesce(sum(when(isLine && col("__c") > 1, col("__len") * col("__c"))),
        lit(0L)) / sum(when(isLine, col("__len") * col("__c"))), 6)
    ranked.groupBy(col(idCol)).agg(
        coalesce(dupLineFrac, lit(0.0)).as("dup_line_frac"),
        coalesce(dupCharFrac, lit(0.0)).as("dup_char_frac"),
        topOf(2).as("top2gram_frac"), topOf(3).as("top3gram_frac"),
        topOf(4).as("top4gram_frac"))
      .select(col(idCol), col("dup_line_frac"), col("dup_char_frac"),
        col("top2gram_frac"), col("top3gram_frac"), col("top4gram_frac"),
        (col("dup_line_frac") <= 0.30 && col("dup_char_frac") <= 0.20 &&
          col("top2gram_frac") <= 0.20 && col("top3gram_frac") <= 0.18 &&
          col("top4gram_frac") <= 0.16).as("pass"))
  }

  /** C4-style page cleanup (Raffel et al. 2020, §2.2 — the other canonical
    * pre-training filter beside Gopher): LINE-level keep rules (a line
    * survives iff it ends in terminal punctuation `. ! ? "`, has ≥
    * `minLineWords` words, and does not mention "javascript"
    * case-insensitively), then PAGE-level rules: the sentence floor (≥
    * `minSentences` — terminal punctuation marks in the KEPT text, the
    * cheap splitter-free proxy) plus content rules evaluated on the
    * ORIGINAL page text — no "lorem ipsum", no `{`, no word-boundary
    * match against `badWords` (C4's external list is caller-supplied).
    * Matching the C4 reference, a page containing `{` anywhere is
    * rejected even when the offending line was already dropped by the
    * line filter (spec-pinned). Returns one
    * row per doc with `text_clean` (kept lines rejoined), the measured
    * counts, one boolean per page rule, and `pass` — the line REWRITE
    * applies even to failing pages so callers can audit what the gate saw.
    *
    * Scale shape: a single select of split/filter/HOF built-ins — zero
    * shuffle, zero UDFs, one map pass over the scan (same posture as
    * [[gopherGate]]); every rule has a DuckDB twin (list_filter /
    * ends_with / regexp_count), so the whole gate is oracle-replayable
    * (q_c4_gate). */
  def c4Gate(df: DataFrame, idCol: String, textCol: String,
      minSentences: Long = 5L, minLineWords: Long = 3L,
      badWords: Seq[String] = Nil): DataFrame = {
    val keptLines = filter(
      transform(split(col(textCol), "\n", -1), l => trim(l)),
      t => (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") ||
          t.endsWith("\"")) &&
        size(filter(split(t, " ", -1), w => length(w) > 0)) >= minLineWords &&
        !lower(t).contains("javascript"))
    val cleaned = array_join(keptLines, "\n")
    val nSents = regexp_count(cleaned, lit("[.!?]")).cast("long")
    val rSents = nSents >= minSentences
    val rLorem = !lower(col(textCol)).contains("lorem ipsum")
    val rBrace = !col(textCol).contains("{")
    val rBad =
      if (badWords.isEmpty) lit(true)
      else !lower(col(textCol)).rlike(
        badWords.map(w => java.util.regex.Pattern.quote(w.toLowerCase))
          .mkString("\\b(", "|", ")\\b"))
    df.select(col(idCol), cleaned.as("text_clean"),
      size(keptLines).cast("long").as("n_lines_kept"),
      nSents.as("n_sentences"),
      rSents.as("r_sentences"), rLorem.as("r_lorem"), rBrace.as("r_brace"),
      rBad.as("r_badwords"),
      (rSents && rLorem && rBrace && rBad).as("pass"))
  }

  /** The Gopher-rule stop set (Rae et al. 2021, appendix A1.1): a doc must
    * contain at least `minStopwordHits` DISTINCT members to pass. */
  val GopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The seven Gopher measurements for one text Column; single source of
    * truth for [[gopherGate]] and [[gopherPass]]. Ratios round to 6 places
    * for cross-engine float compare; empty documents measure an explicit
    * 0.0 (not NULL) everywhere, so non-ANSI division can't diverge across
    * engines. */
  private final case class GopherMeasures(nWords: Column, meanWordLen: Column,
      symbolRatio: Column, bulletFrac: Column, ellipsisFrac: Column,
      alphaFrac: Column, stopHits: Column)

  private def gopherMeasures(text: Column): GopherMeasures = {
    val words = filter(split(text, " "), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val sumWordLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val meanWordLen = when(nWords === 0, lit(0.0))
      .otherwise(round(sumWordLen.cast("double") / nWords, 6))
    val hashCount = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipsisCount =
      (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)
    val symbolRatio = when(nWords === 0, lit(0.0))
      .otherwise(round((hashCount + ellipsisCount).cast("double") / nWords, 6))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long") // split("") = [""] — never 0
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(round(alphaWords.cast("double") / nWords, 6))
    val stopHits = size(filter(
      array(GopherStopwords.map(lit): _*), s => array_contains(words, s)))
      .cast("long")
    GopherMeasures(nWords, meanWordLen, symbolRatio,
      round(bulletLines.cast("double") / nLines, 6),
      round(ellipsisLines.cast("double") / nLines, 6), alphaFrac, stopHits)
  }

  /** Composite Gopher-rule quality gate (Rae et al. 2021, appendix A1.1) —
    * the standard pre-training document filter: word-count bounds, mean
    * word length bounds, symbol-to-word ratio (# and ...), bullet-line and
    * ellipsis-line fractions, alphabetic-word fraction, and distinct-
    * stopword evidence. Returns one row per input row with the measured
    * values, one boolean per rule, and `pass` = AND of all rules.
    *
    * Scale shape: a single `select` of built-ins and higher-order
    * functions — zero shuffle, zero UDFs; at 100 TB this is one map-side
    * pass over the scan (HOF lambdas evaluate interpreted — CodegenFallback
    * — but stay in the same Project). */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1, maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2L): DataFrame = {
    val m = gopherMeasures(col(textCol))
    val rWords = m.nWords >= minWords && m.nWords <= maxWords
    val rWordLen =
      m.meanWordLen >= minMeanWordLen && m.meanWordLen <= maxMeanWordLen
    val rSymbol = m.symbolRatio <= maxSymbolWordRatio
    val rBullet = m.bulletFrac <= maxBulletLineFrac
    val rEllipsis = m.ellipsisFrac <= maxEllipsisLineFrac
    val rAlpha = m.alphaFrac >= minAlphaWordFrac
    val rStop = m.stopHits >= minStopwordHits
    df.select(col(idCol), m.nWords.as("n_words"),
      m.meanWordLen.as("mean_word_len"), m.symbolRatio.as("symbol_ratio"),
      m.bulletFrac.as("bullet_frac"), m.ellipsisFrac.as("ellipsis_frac"),
      m.alphaFrac.as("alpha_frac"), m.stopHits.as("stop_hits"),
      rWords.as("r_words"), rWordLen.as("r_word_len"), rSymbol.as("r_symbol"),
      rBullet.as("r_bullet"), rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stop"),
      (rWords && rWordLen && rSymbol && rBullet && rEllipsis && rAlpha &&
        rStop).as("pass"))
  }

  /** The Gopher verdict alone as a boolean Column — for pure-filter use
    * (`docs.filter(gopherPass(col("text")))`): stays a map-side predicate,
    * no join, no extra columns. Same rules and defaults as [[gopherGate]]. */
  def gopherPass(text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1, maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2L): Column = {
    val m = gopherMeasures(text)
    m.nWords >= minWords && m.nWords <= maxWords &&
      m.meanWordLen >= minMeanWordLen && m.meanWordLen <= maxMeanWordLen &&
      m.symbolRatio <= maxSymbolWordRatio &&
      m.bulletFrac <= maxBulletLineFrac &&
      m.ellipsisFrac <= maxEllipsisLineFrac &&
      m.alphaFrac >= minAlphaWordFrac && m.stopHits >= minStopwordHits
  }

  /** Encoding-damage metrics — the mojibake/corruption triage every
    * web-scale text pipeline runs before spending tokens on broken bytes:
    * counts of U+FFFD replacement characters (a decoder's "gave up"
    * marker), of C0 control characters other than tab/newline/CR (binary
    * bleed-through), and of the classic UTF-8-read-as-Latin-1 digraphs
    * (Ã or Â followed by a char in the continuation range U+0080–U+00BF —
    * the "Ã©"-for-"é" signature), plus `bad_char_ratio` over the doc's
    * characters and a `clean` verdict at `maxBadRatio`. Empty docs are
    * explicitly clean at ratio 0.0 (the [[qualityScore]] guard rationale).
    *
    * Three `regexp_count`s in one codegen'd select — zero shuffle at any
    * corpus size; every pattern is RE2-expressible so the verdict replays
    * in DuckDB (q_encoding_quality). */
  private def encodingDamage(text: Column): (Column, Column, Column, Column) = {
    val nRepl = regexp_count(text, lit("\uFFFD")).cast("long")
    val nCtrl = regexp_count(text,
      lit("[\u0000-\u0008\u000B\u000C\u000E-\u001F]")).cast("long")
    val nMoji = regexp_count(text,
      lit("[\u00C3\u00C2][\u0080-\u00BF]")).cast("long")
    val ratio = when(length(text) === 0, lit(0.0))
      .otherwise(round((nRepl + nCtrl + nMoji * 2).cast("double") /
        length(text), 6))
    (nRepl, nCtrl, nMoji, ratio)
  }

  def encodingQualityMetrics(df: DataFrame, idCol: String, textCol: String,
      maxBadRatio: Double = 0.001): DataFrame = {
    val (nRepl, nCtrl, nMoji, ratio) = encodingDamage(col(textCol))
    df.select(col(idCol), nRepl.as("n_replacement"), nCtrl.as("n_control"),
      nMoji.as("n_mojibake"), ratio.as("bad_char_ratio"),
      (ratio <= maxBadRatio).as("clean"))
  }

  /** The encoding verdict alone, for pure-filter use — a map-side
    * predicate like [[gopherPass]]; same measures as
    * [[encodingQualityMetrics]]. */
  def encodingClean(text: Column, maxBadRatio: Double = 0.001): Column =
    encodingDamage(text)._4 <= maxBadRatio

  /** Character n-gram shingles (rolling window), for MinHash/fingerprints. */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Rolling-hash-style document fingerprint: the lexicographic minimum of
    * the hashed character n-gram shingles — stable under small edits, unlike
    * the whole-document hash. */
  def minShingleFingerprint(text: Column, n: Int): Column =
    array_min(transform(charShingles(text, n), s => md5(s)))

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03
    * — the MOSS scheme): hash every `k`-char gram, slide a `w`-hash
    * window, keep each window's MINIMUM hash; the distinct selected
    * values are the fingerprint set. Guarantee: two docs sharing any
    * substring of ≥ w + k − 1 chars share at least one fingerprint, at
    * expected density 2/(w+1) — positional robustness that whole-doc or
    * global-min hashing lacks. Returns the sorted distinct selected
    * hashes.
    *
    * `hashFn` defaults to md5 so any SQL engine replays the SELECTION
    * bit-for-bit (window minima depend on hash VALUES, so cross-engine
    * agreement needs an agreed hash — same dual as MinHash's md5 oracle
    * path). Production uses [[graft.expressions.WinnowHashes]]: same
    * selection over xxhash64 in one codegen pass (this HOF form
    * re-materializes every window slice — O(n·w) per doc). Fewer than w
    * windows selects the global minimum; fewer than k chars yields NULL
    * (the char_ngrams/span_hashes convention — explode drops the row). */
  def winnowFingerprints(text: Column, k: Int, w: Int,
      hashFn: Column => Column = md5): Column = {
    require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    val grams = when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k))))
    val hashes = transform(grams, hashFn)
    // Lambda-let: Catalyst has no common-subexpression binding across a
    // HOF boundary, so referencing `hashes` directly inside the window
    // lambda would re-evaluate the FULL hash transform for every window
    // (O(n²) hash calls per doc — measured 100 ms/doc on 300-char rows).
    // Wrapping the array in a one-element array and transforming binds
    // the evaluated hashes to a lambda variable exactly once per row.
    element_at(transform(array(hashes), hs => {
      val m = size(hs)
      array_sort(
        when(m <= w, array(array_min(hs)))
          .otherwise(array_distinct(transform(sequence(lit(0), m - w),
            i => array_min(slice(hs, i + 1, lit(w)))))))
    }), 1)
  }
}

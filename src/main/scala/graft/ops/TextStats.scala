package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * built-in column expressions (whole-stage codegen; no UDFs), so they
  * push down/prune like any Catalyst plan at 100 TB.
  *
  * Reference analogs: the tiktoken budget filter
  * (/root/reference/src/embedding.py:63-85, F3) and the text-cleanup
  * projections of SURVEY.md §2.2.
  */
object TextStats {

  /** Whitespace-delimited token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * punctuation singles), each word contributing ceil(len/4) subwords —
    * the classic ~4-chars-per-token budget heuristic standing in for
    * tiktoken (embedding.py:70-85), which is unavailable offline.
    */
  def tokenCountBpeIsh(text: Column): Column = {
    val pieces = filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val wordTokens = aggregate(pieces, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
    // one codegen'd regex pass, not a per-char array + interpreted rlike
    // lambda (the ~10x trap langIdByScript documents)
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    wordTokens + punct.cast("long")
  }

  /** Oversize filter predicate (F3): keep docs within the token budget. */
  def withinTokenBudget(text: Column, maxTokens: Int): Column =
    tokenCountBpeIsh(text) <= maxTokens

  /** Script-ratio language ID (n-gram-free heuristic): classify by the
    * dominant unicode script among letters; 'unknown' when below minRatio.
    * At web scale this runs as a single projection over the text column.
    */
  def langIdByScript(text: Column, minRatio: Double = 0.5): Column = {
    // one regexp_count pass per script class (codegen'd) — counting chars
    // via per-char array lambdas is interpreted and ~10x slower
    val nLetters = regexp_count(text, lit("\\p{L}"))
    val total = greatest(nLetters, lit(1)).cast("double")
    val arabicN = regexp_count(text, lit("\\p{IsArabic}")).cast("double")
    val latinN = regexp_count(text, lit("\\p{IsLatin}")).cast("double")
    val cyrN = regexp_count(text, lit("\\p{IsCyrillic}")).cast("double")
    val hanN = regexp_count(text, lit("\\p{IsHan}")).cast("double")
    when(nLetters === 0, lit("unknown"))
      .when(arabicN / total >= minRatio,
        // Persian vs Arabic: Persian-specific letters پچژگ or ZWNJ usage
        when(text.rlike("[پچژگی]"), lit("fa")).otherwise(lit("ar")))
      .when(hanN / total >= minRatio, lit("zh"))
      .when(cyrN / total >= minRatio, lit("ru"))
      .when(latinN / total >= minRatio, lit("latin"))
      .otherwise(lit("unknown"))
  }

  /** Quality features struct: n_chars, n_tokens, mean word length,
    * punctuation ratio, digit ratio (any Unicode decimal digit — Persian
    * ۰-۹ included), stopword-ish ratio (English function words as a crude
    * proxy).
    */
  /** The pipeline-unified lowercased whitespace tokenizer (`\s+` split,
    * empties dropped) — ONE definition shared by quality features and the
    * NB classifier so model scores can never drift from the tokens the
    * rest of the pipeline counts. Oracle mirror:
    * `list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)`.
    */
  def wsTokensLower(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  def qualityFeatures(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    val toks = wsTokensLower(text)
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val stopN = size(filter(toks, t => t.isin(stop.map(lit): _*))).cast("double")
    val punctN = (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
    val digitN = (length(text) - length(regexp_replace(text, "[\\p{Nd}]", ""))).cast("double")
    val meanWordLen = aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nToks
    struct(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(punctN / n, 6).as("punct_ratio"),
      round(digitN / n, 6).as("digit_ratio"),
      round(stopN / nToks, 6).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation/digit noise. Deterministic, monotone in its features.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_tokens").cast("double") / 100.0, lit(1.0))
    val noise = f.getField("punct_ratio") + f.getField("digit_ratio")
    round(greatest(least(lenScore * 0.5 + f.getField("stopword_ratio") * 2.0 * 0.3 +
      (lit(1.0) - least(noise * 4.0, lit(1.0))) * 0.2, lit(1.0)), lit(0.0)), 6)
  }

  /** Gopher/FineWeb-style repetition signals — the quality gates a
    * web-scale curation pipeline filters on beyond surface features
    * (Rae et al. 2021 appendix A1.1: repetitious documents correlate with
    * low quality): fraction of duplicate lines, mass fraction of the most
    * frequent word, fraction of duplicate word 3-grams. Pure built-in
    * array expressions — a shuffle-free per-document projection; the
    * top-word count is the longest run of the SORTED word array (an
    * O(n log n) fold), not an O(n²) per-distinct-word rescan.
    */
  def repetitionSignals(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    val nLines = size(lines)
    val dupLineFrac = when(nLines > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / nLines.cast("double"))
      .otherwise(lit(0.0))
    val words = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)
    val nWords = size(words)
    // longest run in the sorted array == the most frequent word's count
    val sorted = array_sort(words)
    val topCount = aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (s, w) => {
        val run = when(w === s.getField("prev"), s.getField("run") + 1)
          .otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    val topWordFrac = when(nWords > 0,
      topCount.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val grams = wordTriGrams(words)
    val nGrams = size(grams)
    val dupGramFrac = when(nGrams > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / nGrams.cast("double"))
      .otherwise(lit(0.0))
    struct(
      round(dupLineFrac, 6).as("dup_line_frac"),
      round(topWordFrac, 6).as("top_word_frac"),
      round(dupGramFrac, 6).as("dup_3gram_frac"))
  }

  /** Word n-grams via chained zip_with over shifted copies of the word
    * array. zip_with ARGUMENTS are evaluated once per row, whereas a
    * slice(words, i, n) inside a transform lambda re-evaluates the
    * captured word split per element — O(len²) in doc length (measured
    * 50x on the char-gram analog, CharLm.charNgrams). zip_with pads the
    * shorter side with null and concat propagates it, so the trailing
    * partial windows drop in one null filter. Empty when < n words.
    */
  def wordNgrams(words: Column, n: Int): Column = {
    require(n >= 2, s"wordNgrams needs n >= 2 (got $n); n = 1 is the word array")
    val sz = size(words)
    val joined = (1 until n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k + 1), greatest(sz - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(sz >= n, filter(joined, g => g.isNotNull))
      .otherwise(array().cast("array<string>"))
  }

  private[ops] def wordTriGrams(words: Column): Column = wordNgrams(words, 3)

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the canonical-form hash used for exact near-layout dedup.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Winnowing-style robust fingerprint: min-k of rolling n-gram hashes
    * (k smallest xxhash64 over word 3-grams) as a sorted array — stable
    * under local edits; built-ins only. Docs with < 3 words fingerprint
    * to the empty array.
    */
  def minKFingerprint(text: Column, k: Int = 8): Column = {
    val words = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    val hashes = transform(wordTriGrams(words), g => xxhash64(g))
    slice(array_sort(array_distinct(hashes)), 1, k)
  }
}

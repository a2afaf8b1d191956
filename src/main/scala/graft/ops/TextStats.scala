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

  /** One-pass per-code-point script/letter counter for [[langIdByScript]]:
    * (letters, arabic, latin, cyrillic, han, hasPersianChar). The former
    * regexp_count form paid one regex `find()` PER MATCHED CHARACTER per
    * script class (~1.2 ms/row measured on 360-char docs — ProfileSignals);
    * this loop reads each code point once (~5 µs/row). Semantics identical
    * by construction: `\p{L}` == Character.isLetter (categories L*),
    * `\p{IsXxx}` == Character.UnicodeScript.of — the regex engine consults
    * the same tables. Null text returns zero letters, which the when-chain
    * maps to 'unknown' exactly as the null-propagating regex form did.
    */
  private val scriptCountsUdf = udf((text: String) => {
    if (text == null) (0, 0, 0, 0, 0, false)
    else {
      var letters = 0; var arabic = 0; var latin = 0; var cyr = 0; var han = 0
      var fa = false
      var i = 0
      val n = text.length
      while (i < n) {
        val cp = text.codePointAt(i)
        if (Character.isLetter(cp)) letters += 1
        val sc = Character.UnicodeScript.of(cp)
        if (sc == Character.UnicodeScript.ARABIC) arabic += 1
        else if (sc == Character.UnicodeScript.LATIN) latin += 1
        else if (sc == Character.UnicodeScript.CYRILLIC) cyr += 1
        else if (sc == Character.UnicodeScript.HAN) han += 1
        if (cp == 'پ' || cp == 'چ' || cp == 'ژ' || cp == 'گ' || cp == 'ی')
          fa = true
        i += Character.charCount(cp)
      }
      (letters, arabic, latin, cyr, han, fa)
    }
  })

  /** Script-ratio language ID (n-gram-free heuristic): classify by the
    * dominant unicode script among letters; 'unknown' when below minRatio.
    * At web scale this runs as a single projection over the text column —
    * counts from the one-pass [[scriptCountsUdf]], the ratio decision
    * chain unchanged Catalyst arithmetic.
    */
  def langIdByScript(text: Column, minRatio: Double = 0.5): Column = {
    val c = scriptCountsUdf(text)
    val nLetters = c.getField("_1")
    val total = greatest(nLetters, lit(1)).cast("double")
    val arabicN = c.getField("_2").cast("double")
    val latinN = c.getField("_3").cast("double")
    val cyrN = c.getField("_4").cast("double")
    val hanN = c.getField("_5").cast("double")
    when(nLetters === 0, lit("unknown"))
      .when(arabicN / total >= minRatio,
        // Persian vs Arabic: Persian-specific letters پچژگ or ZWNJ usage
        when(c.getField("_6"), lit("fa")).otherwise(lit("ar")))
      .when(hanN / total >= minRatio, lit("zh"))
      .when(cyrN / total >= minRatio, lit("ru"))
      .when(latinN / total >= minRatio, lit("latin"))
      .otherwise(lit("unknown"))
  }

  /** The pipeline-unified lowercased whitespace tokenizer (`\s+` split,
    * empties dropped) — ONE definition shared by quality features and the
    * NB classifier so model scores can never drift from the tokens the
    * rest of the pipeline counts. Oracle mirror:
    * `list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)`.
    */
  def wsTokensLower(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** One-pass counters for [[qualityFeatures]]: (nChars, nToks,
    * sumWordLen, punctN, digitN, stopN) — the former form paid two
    * regexp_replace passes plus interpreted HOF filters/aggregate per row
    * (ProfileSignals). Count semantics replicated exactly: char counts
    * are CODE POINTS (Spark length()/UTF8String.numChars — Java
    * String.length would double-count supplementary chars), tokens are
    * the Spark-lowercased `\s+` split with empties dropped
    * ([[wsTokensLower]] — Java \s, so VT included), `\p{Punct}` is the
    * POSIX ASCII class, `\p{Nd}` the Unicode decimal-digit category. Null
    * text returns a null struct, which the Catalyst chain below maps to
    * the same null fields the expression form produced. Ratio arithmetic
    * and rounding stay Catalyst expressions.
    */
  private val qualityCountsUdf = udf((text: String) => {
    if (text == null) null
    else {
      var nChars = 0; var punctN = 0; var digitN = 0
      var i = 0
      val len = text.length
      while (i < len) {
        val cp = text.codePointAt(i)
        nChars += 1
        // \p{Punct} (POSIX, ASCII-only): !-/ :-@ [-` {-~
        if (cp < 127 && ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
          (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))) punctN += 1
        if (Character.getType(cp) == Character.DECIMAL_DIGIT_NUMBER) digitN += 1
        i += Character.charCount(cp)
      }
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val rawToks = TextStats.wsPattern.split(lowered, -1)
      var nToks = 0; var sumWordLen = 0L; var stopN = 0
      i = 0
      while (i < rawToks.length) {
        val t = rawToks(i)
        if (t.nonEmpty) {
          nToks += 1
          sumWordLen += t.codePointCount(0, t.length)
          if (TextStats.stopSet.contains(t)) stopN += 1
        }
        i += 1
      }
      (nChars, nToks, sumWordLen, punctN, digitN, stopN)
    }
  })

  private[ops] val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private[ops] val stopSet = Set("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it")

  /** Quality features struct: n_chars, n_tokens, mean word length,
    * punctuation ratio, digit ratio (any Unicode decimal digit — Persian
    * ۰-۹ included), stopword-ish ratio (English function words as a crude
    * proxy).
    */
  def qualityFeatures(text: Column): Column = {
    val c = qualityCountsUdf(text)
    val n = greatest(c.getField("_1"), lit(1)).cast("double")
    val nToks = greatest(c.getField("_2"), lit(1)).cast("double")
    val meanWordLen = c.getField("_3").cast("double") / nToks
    struct(
      c.getField("_1").as("n_chars"),
      c.getField("_2").as("n_tokens"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(c.getField("_4").cast("double") / n, 6).as("punct_ratio"),
      round(c.getField("_5").cast("double") / n, 6).as("digit_ratio"),
      round(c.getField("_6").cast("double") / nToks, 6).as("stopword_ratio"))
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

  /** One-pass counters for [[repetitionSignals]]: (nLines, distinctLines,
    * nWords, topWordCount, nGrams, distinctGrams). The former pure-HOF
    * form (array_sort + struct-accumulator aggregate + chained zip_with
    * trigrams) runs interpreted at ~360 µs/row (ProfileSignals); the loop
    * is ~15 µs/row. Count semantics replicated exactly:
    *   - lines: regex split on \n keeping trailing empties (Spark split
    *     limit -1), each trimmed of 0x20 SPACES only (Spark trim — Java's
    *     String.trim would also strip \t/\r), empties dropped
    *   - words: Spark-lowercased text (UTF8String.toLowerCase) regex-split
    *     on [^\p{L}\p{N}]+, empties dropped; top count via hash map ==
    *     the former longest-run-in-sorted-array
    *   - grams: consecutive word triples joined with ' ' (the zip_with
    *     construction), nGrams = nWords - 2 when nWords >= 3 else 0
    * The fraction arithmetic and rounding stay Catalyst expressions below,
    * so the output is bit-identical given equal counts (spec-pinned).
    */
  private val repCountsUdf = udf((text: String) => {
    if (text == null) (0, 0, 0, 0, 0, 0)
    else {
      def trimSpaces(s: String): String = {
        var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        s.substring(a, b)
      }
      var nLines = 0
      val lineSet = new java.util.HashSet[String]()
      val rawLines = TextStats.nlPattern.split(text, -1)
      var i = 0
      while (i < rawLines.length) {
        val t = trimSpaces(rawLines(i))
        if (t.nonEmpty) { nLines += 1; lineSet.add(t) }
        i += 1
      }
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      val rawWords = TextStats.wordPattern.split(lowered, -1)
      val counts = new java.util.HashMap[String, Int]()
      val words = new java.util.ArrayList[String](rawWords.length)
      i = 0
      while (i < rawWords.length) {
        val w = rawWords(i)
        if (w.nonEmpty) { words.add(w); counts.merge(w, 1, Integer.sum) }
        i += 1
      }
      val nWords = words.size
      var top = 0
      val it = counts.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v > top) top = v }
      var nGrams = 0
      val gramSet = new java.util.HashSet[String]()
      if (nWords >= 3) {
        nGrams = nWords - 2
        var g = 0
        while (g < nGrams) {
          gramSet.add(words.get(g) + " " + words.get(g + 1) + " " + words.get(g + 2))
          g += 1
        }
      }
      (nLines, lineSet.size, nWords, top, nGrams, gramSet.size)
    }
  })

  private[ops] val nlPattern = java.util.regex.Pattern.compile("\n")
  private[ops] val wordPattern =
    java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  /** Gopher/FineWeb-style repetition signals — the quality gates a
    * web-scale curation pipeline filters on beyond surface features
    * (Rae et al. 2021 appendix A1.1: repetitious documents correlate with
    * low quality): fraction of duplicate lines, mass fraction of the most
    * frequent word, fraction of duplicate word 3-grams. A shuffle-free
    * per-document projection: counts from the one-pass [[repCountsUdf]],
    * fraction arithmetic and rounding unchanged Catalyst expressions.
    */
  def repetitionSignals(text: Column): Column = {
    val c = repCountsUdf(text)
    val nLines = c.getField("_1")
    val dupLineFrac = when(nLines > 0,
      lit(1.0) - c.getField("_2").cast("double") / nLines.cast("double"))
      .otherwise(lit(0.0))
    val nWords = c.getField("_3")
    val topWordFrac = when(nWords > 0,
      c.getField("_4").cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val nGrams = c.getField("_5")
    val dupGramFrac = when(nGrams > 0,
      lit(1.0) - c.getField("_6").cast("double") / nGrams.cast("double"))
      .otherwise(lit(0.0))
    struct(
      round(dupLineFrac, 6).as("dup_line_frac"),
      round(topWordFrac, 6).as("top_word_frac"),
      round(dupGramFrac, 6).as("dup_3gram_frac"))
  }

  /** Word n-grams — space-joined windows of n consecutive words, empty
    * below n words (and for a null array). One rolling StringBuilder pass;
    * bit-identical to the former chained-zip_with construction
    * (FunctionsSpec pins the parity), which evaluated n-1 interpreted
    * lambda passes over the array per row: a window containing a null
    * word drops, exactly as concat's null propagation + the null filter
    * dropped it there.
    */
  def wordNgrams(words: Column, n: Int): Column = {
    require(n >= 2, s"wordNgrams needs n >= 2 (got $n); n = 1 is the word array")
    wordNgramsUdf(n)(words)
  }

  private[graft] def wordNgramsUdf(n: Int) = udf((ws: Seq[String]) => {
    if (ws == null || ws.length < n) Array.empty[String]
    else {
      val arr = ws.toArray
      val out = new scala.collection.mutable.ArrayBuffer[String](arr.length - n + 1)
      val sb = new java.lang.StringBuilder(n * 12)
      var i = 0
      while (i + n <= arr.length) {
        var ok = true
        var j = 0
        sb.setLength(0)
        while (j < n && ok) {
          val w = arr(i + j)
          if (w == null) ok = false
          else {
            if (j > 0) sb.append(' ')
            sb.append(w)
          }
          j += 1
        }
        if (ok) out += sb.toString
        i += 1
      }
      out.toArray
    }
  })

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

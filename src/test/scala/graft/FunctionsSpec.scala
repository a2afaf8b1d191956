package graft

import graft.functions.GraftFunctions

/** SQL surface: the engine's scalar kernels registered as named functions. */
class FunctionsSpec extends SparkTestBase {

  test("registered functions work from spark.sql") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  jalali_to_gregorian('1403/01/01') AS g,
        |  jalali_normalize('03-1-1') AS sh,
        |  canonical_url('HTTPS://H.IR:443/a/../b?z=1&a=2#f') AS cu,
        |  url_host('https://user@X.IR:8443/p') AS h,
        |  idea_id('https://h.ir/Detail?IdeaId=42') AS iid,
        |  is_valid_page('<div>سالم</div>') AS ok,
        |  is_valid_page('<div>خطایی رخ داده است</div>') AS bad
        |""".stripMargin).collect()(0)
    assert(row.getAs[String]("g") == "2024/03/20")
    assert(row.getAs[String]("sh") == "1403/01/01")
    assert(row.getAs[String]("cu") == "https://h.ir/b?a=2&z=1")
    assert(row.getAs[String]("h") == "x.ir")
    assert(row.getAs[String]("iid") == "42")
    assert(row.getAs[Boolean]("ok"))
    assert(!row.getAs[Boolean]("bad"))
  }

  test("Urls.hostColumn == Urls.host on the adversarial set") {
    // the declarative twin MUST track the scalar exactly: the frontier's
    // host column is Urls.host, and hostRank/fetchRateByHost key joins
    // and metrics on hostColumn-derived values
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://Example.com:8443/a",        // case + port
      "http://user:p@ss@HOST.ir/x",        // userinfo with '@' in password
      "http://example.com",                // path-less
      "http://example.com?x=1",            // query, no slash
      "http://example.com#f",              // fragment, no slash
      "https://[2001:DB8::1]:8080/p",      // IPv6 with port
      "https://[::1]",                     // bare IPv6
      "ftp://A.B.C:21/f",                  // non-http scheme
      "no-scheme/path",                    // unparseable
      "http:///empty-auth",                // empty authority
      "relative?q=://host.in.query/x",     // "://" appearing mid-string
      ""                                   // empty
    )
    val got = urls.toDF("u")
      .select(col("u"), graft.url.Urls.hostColumn(col("u")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    urls.foreach { u =>
      assert(got(u) == graft.url.Urls.host(u),
        s"url=$u column=${got(u)} scalar=${graft.url.Urls.host(u)}")
    }
    // null input: scalar returns "" — the column twin must too
    val nullGot = Seq(Option.empty[String]).toDF("u")
      .select(graft.url.Urls.hostColumn(col("u")).as("h")).collect()(0).getString(0)
    assert(nullGot == "")
  }

  test("extract_* functions match the typed extractor byte-for-byte") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val html =
      """<div id="mvcContainer-1286"><div><div><div>t</div><div><div>
        |<div><div>x</div><div><div>1</div><div>2</div><div>1403/2/2</div></div></div>
        |<div><div><div>h</div><div><div>پرسش نمونه</div></div><div>s</div>
        |<div><div>پاسخ نمونه</div></div></div></div>
        |</div></div></div></div></div>""".stripMargin
    val df = Seq(html).toDF("page")
    df.createOrReplaceTempView("p")
    val r = spark.sql(
      "SELECT extract_question(page) q, extract_answer(page) a, extract_content(page) c FROM p")
      .collect()(0)
    val direct = graft.extract.Extractor.extract("u", "f", html)
    assert(r.getString(0) == direct.question && direct.question == "پرسش نمونه")
    assert(r.getString(1) == direct.answer && direct.answer == "پاسخ نمونه")
    assert(r.getString(2) == direct.content)
  }

  test("SparkEntry.forestText == the md5 HOF expression it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the curate-family gate corpora are built by the typed forest map;
    // this pins it to the original declarative construction (and hence to
    // the DuckDB oracles' substr(md5(...), 1, 8) chain) byte-for-byte
    val seeds = Seq("-", "-f-", "-g-")
    val ids = Seq(0L, 7L, 3999L, 50000123L)
    for (seed <- seeds) {
      val expr = array_join(transform(sequence(lit(0), lit(39)),
        j => substring(md5(concat(col("doc_id").cast("string"), lit(seed),
          j.cast("string"))), 1, 8)), " ")
      val expected = ids.toDF("doc_id").select(col("doc_id"), expr.as("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      ids.foreach { id =>
        assert(SparkEntry.forestText(id, seed) == expected(id),
          s"forestText($id, $seed) diverged from the expression form")
      }
    }
  }

  /** The original chained-zip_with ngram construction, verbatim — the
    * production wordNgrams is now a rolling-window UDF, so the old
    * expression lives here as the parity reference.
    */
  private def wordNgramsExpr(words: org.apache.spark.sql.Column, n: Int) = {
    import org.apache.spark.sql.functions._
    val sz = size(words)
    val joined = (1 until n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k + 1), greatest(sz - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(sz >= n, filter(joined, g => g.isNotNull))
      .otherwise(array().cast("array<string>"))
  }

  test("TextStats langId/repetition == the regex/HOF expressions they replaced") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextStats
    import spark.implicits._
    // adversarial fixtures: mixed scripts, Persian-specific letters,
    // supplementary code points, tab/CR/VT whitespace (Spark trim strips
    // only 0x20 — a Java String.trim twin would diverge on these),
    // trailing newlines (split keeps trailing empties), null, empty,
    // digits-only, single-word, repeated lines/words/grams
    val texts = Seq(
      "hello world this is plain english text",
      "سلام دنیا این یک متن فارسی است که پژوهش می‌کند",
      "مرحبا بالعالم هذا نص عربي بسيط",
      "你好世界这是中文文本",
      "Привет мир это русский текст",
      "12345 !!!", "", " ", "\n\n\n", "one",
      "same line here\nother text\n\n  same line here  \nfinal bit same",
      "spam spam spam spam",
      "tab\tline\nline with\ttab\ncr line\r\ncr line\r",
      "vtline\nvtline",
      "MiXeD CaSe WORDS mixed case words",
      "😀 emoji 𝐀 math-bold-A 𐹠 and more",
      "a-b c_d e.f g,h", "word‌joined‌by‌zwnj",
      null, "läuft grüße STRASSE ß", "٠١٢٣٤ ارقام عربية ١٢٣")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    // the original regexp_count langId chain, verbatim
    def langExpr(text: org.apache.spark.sql.Column, minRatio: Double = 0.5) = {
      val nLetters = regexp_count(text, lit("\\p{L}"))
      val total = greatest(nLetters, lit(1)).cast("double")
      val arabicN = regexp_count(text, lit("\\p{IsArabic}")).cast("double")
      val latinN = regexp_count(text, lit("\\p{IsLatin}")).cast("double")
      val cyrN = regexp_count(text, lit("\\p{IsCyrillic}")).cast("double")
      val hanN = regexp_count(text, lit("\\p{IsHan}")).cast("double")
      when(nLetters === 0, lit("unknown"))
        .when(arabicN / total >= minRatio,
          when(text.rlike("[پچژگی]"), lit("fa")).otherwise(lit("ar")))
        .when(hanN / total >= minRatio, lit("zh"))
        .when(cyrN / total >= minRatio, lit("ru"))
        .when(latinN / total >= minRatio, lit("latin"))
        .otherwise(lit("unknown"))
    }
    // the original pure-HOF repetition chain, verbatim
    def repExpr(text: org.apache.spark.sql.Column) = {
      val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
      val nLines = size(lines)
      val dupLineFrac = when(nLines > 0,
        lit(1.0) - size(array_distinct(lines)).cast("double") / nLines.cast("double"))
        .otherwise(lit(0.0))
      val words = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)
      val nWords = size(words)
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
      val grams = wordNgramsExpr(words, 3)
      val nGrams = size(grams)
      val dupGramFrac = when(nGrams > 0,
        lit(1.0) - size(array_distinct(grams)).cast("double") / nGrams.cast("double"))
        .otherwise(lit(0.0))
      struct(
        round(dupLineFrac, 6).as("dup_line_frac"),
        round(topWordFrac, 6).as("top_word_frac"),
        round(dupGramFrac, 6).as("dup_3gram_frac"))
    }

    // the original qualityFeatures expression chain, verbatim
    def qfExpr(text: org.apache.spark.sql.Column) = {
      val n = greatest(length(text), lit(1)).cast("double")
      val toks = TextStats.wsTokensLower(text)
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

    val rows = df.select(col("doc_id"),
        TextStats.langIdByScript(col("text")).as("lang_new"),
        langExpr(col("text")).as("lang_old"),
        TextStats.repetitionSignals(col("text")).as("rep_new"),
        repExpr(col("text")).as("rep_old"),
        TextStats.qualityFeatures(col("text")).as("qf_new"),
        qfExpr(col("text")).as("qf_old"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"langId diverged on doc ${r.getLong(0)}: new=${r.getString(1)} old=${r.getString(2)}")
      assert(r.getStruct(3) == r.getStruct(4),
        s"repetition diverged on doc ${r.getLong(0)}: new=${r.getStruct(3)} old=${r.getStruct(4)}")
      assert(r.getStruct(5) == r.getStruct(6),
        s"qualityFeatures diverged on doc ${r.getLong(0)}: new=${r.getStruct(5)} old=${r.getStruct(6)}")
    }
  }

  test("Dedup.gramMd5sUdf == transform(wordNgrams, md5); cluster dup-pair neutrality") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextStats}
    import spark.implicits._
    val texts = Seq(
      "one two three four five six seven eight nine ten eleven",
      "exactly eight words in this very sentence here",
      "short", "", "a b c d e f g h a b c d e f g h",
      "کلمات فارسی برای آزمون گرم های کلمه ای متن تکراری متن تکراری")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), w => length(w) > 0).as("ws"))
    for (k <- Seq(2, 3, 8)) {
      val rows = df.select(col("doc_id"),
          Dedup.gramMd5sUdf(k)(col("ws")).as("fast"),
          transform(wordNgramsExpr(col("ws"), k), g => md5(g)).as("ref"),
          TextStats.wordNgrams(col("ws"), k).as("ng_fast"),
          wordNgramsExpr(col("ws"), k).as("ng_ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"gram md5 diverged for k=$k doc ${r.getLong(0)}")
        assert(r.getSeq[String](3) == r.getSeq[String](4),
          s"wordNgrams diverged for k=$k doc ${r.getLong(0)}")
      }
    }
    // a null ELEMENT inside the word array: the old concat null
    // propagation dropped every window touching it — both UDFs must too
    val nullArr = Seq(Tuple1(Seq("a", "b", null, "c", "d", "e")))
      .toDF("ws")
    for (k <- Seq(2, 3)) {
      val r = nullArr.select(TextStats.wordNgrams(col("ws"), k).as("f"),
        wordNgramsExpr(col("ws"), k).as("s"),
        Dedup.gramMd5sUdf(k)(col("ws")).as("gf"),
        transform(wordNgramsExpr(col("ws"), k), g => md5(g)).as("gs")).collect().head
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"wordNgrams null-element diverged for k=$k: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"gramMd5s null-element diverged for k=$k: ${r.getSeq[String](2)} vs ${r.getSeq[String](3)}")
    }
    // charNgrams: the rolling code-point window == the former
    // transform(sequence)/substr expression, incl. supplementary chars
    // (substr counts code points, not UTF-16 units) and null/short texts
    val ngramTexts = Seq("hello world", "ab", "", null, "😀a😀b😀c",
      "سلام دنیا", "ab\ncd e")
    val ndf = ngramTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    for (n <- Seq(2, 3)) {
      val ref = when(length(col("t")) >= n,
        transform(sequence(lit(1), length(col("t")) - (n - 1)),
          i => col("t").substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
      graft.ops.CharLm // touch
      ndf.select(col("doc_id"),
          graft.ops.CharLm.charNgrams(col("t"), n).as("fast"), ref.as("slow"))
        .collect().foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"charNgrams diverged n=$n doc ${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
        }
    }

    // duplicated pairs must not change cluster assignments (edgesOf no
    // longer distincts — consumers are duplicate-indifferent by design)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val dup = pairs.union(pairs).union(pairs)
    def asMap(dfr: org.apache.spark.sql.DataFrame) = dfr.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asMap(Dedup.clusterAssign(dup)) == asMap(Dedup.clusterAssign(pairs)))
  }
}

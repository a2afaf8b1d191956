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
}

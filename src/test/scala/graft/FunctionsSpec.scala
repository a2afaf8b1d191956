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
}

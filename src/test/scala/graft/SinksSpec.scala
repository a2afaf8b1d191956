package graft

import graft.sinks.Exports
import org.apache.spark.sql.functions._

/** Export-stage operators (K4/K5/K6): render goldens + write round-trips. */
class SinksSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha & <beta>##\"gamma\"", "fa"),
      (2L, "plain", "en"),
      (3L, "a##b##c", "ar")
    ).toDF("doc_id", "text", "lang")
  }

  test("K5 renderHtmlDoc golden: escaping, sections, base64 fingerprint") {
    val out = docs
      .select(col("doc_id"),
        Exports.renderHtmlDoc(col("doc_id"), concat(lit("Doc "), col("doc_id")),
          col("text")).as("html"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val content1 = "alpha & <beta>##\"gamma\""
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(content1.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val fp = java.util.Base64.getEncoder.encodeToString(md5hex.getBytes("UTF-8"))
    val expected1 =
      "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"><title>Doc 1</title></head>\n" +
        s"""<body data-doc="1" data-fp="$fp">\n""" +
        "<div class=\"section\"><p>alpha &amp; &lt;beta&gt;</p></div>\n" +
        "<div class=\"section\"><p>&quot;gamma&quot;</p></div>\n</body></html>"
    assert(out(1L) == expected1)
    assert(out(3L).count(_ == '\n') == 6) // 3 sections → 2 inter-div newlines
  }

  test("K5 sections: split + posexplode preserves order and trailing empties") {
    import spark.implicits._
    val s = Exports.sections(
      Seq((9L, "x##y##")).toDF("doc_id", "content"), "content", "doc_id")
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(s.toSeq == Seq((9L, 0, "x"), (9L, 1, "y"), (9L, 2, "")))
  }

  test("K4 key:value text blocks: golden render + ordered write round-trip") {
    import spark.implicits._
    val df = Seq((2L, "b", 20), (1L, "a", 10)).toDF("id", "name", "v")
    val block = df.filter(col("id") === 1)
      .select(Exports.keyValueBlock(Seq("id", "name", "v")).as("b"))
      .collect()(0).getString(0)
    assert(block == "id: 1\nname: a\nv: 10\n")

    val dir = java.nio.file.Files.createTempDirectory("graft-kv").toString
    Exports.writeKeyValueText(df, Seq("id", "name", "v"), "id", dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    // both rows present; file(s) hold the blocks
    assert(lines.count(_.startsWith("id: ")) == 2)
  }

  test("K4 csv write/read round-trip preserves rows and types") {
    import spark.implicits._
    val df = Seq((1L, "with, comma", 1.5), (2L, "with \"quote\"", -2.0))
      .toDF("id", "s", "x")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Exports.writeCsv(df, dir)
    val back = spark.read.schema(df.schema).option("header", "true").csv(dir)
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "with, comma", 1.5), (2L, "with \"quote\"", -2.0)))
  }

  test("K6 chunked write: no (key, chunk) directory exceeds chunkSize rows") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i.toLong, "k" + (i % 2))).toDF("id", "key")
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    Exports.chunkedWrite(df, "key", "id", chunkSize = 4, dir)
    val back = spark.read.parquet(dir)
    val sizes = back.groupBy(col("key"), col("chunk")).count()
      .collect().map(_.getLong(2))
    assert(sizes.forall(_ <= 4))
    assert(back.count() == 25)
    // chunk ids are dense from 0 per key
    val chunks = back.select(col("key"), col("chunk")).distinct()
      .collect().map(r => (r.getString(0), r.getInt(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(chunks("k0") == (0 to 2))
    assert(chunks("k1") == (0 to 3))
  }
}

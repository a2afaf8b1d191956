package graft

import graft.frontier.Outlinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-side coverage: the saved search-JSON loader (S5/S7) through
  * Spark's native JSON source, cross-checked against the engine's Jackson
  * parse (Outlinks) on identical bodies.
  */
class SourcesSpec extends SparkTestBase {

  test("S5/S7: spark.read.json over saved search-JSON == Jackson parse") {
    import spark.implicits._
    val bodies = (1 to 5).map { p =>
      val items = (1 to 4).map(k =>
        s"""{"DocumentUrl":"/opinions/Detail?IdeaId=${p * 10 + k}","Title":"t$k"}""")
        .mkString(",")
      s"""{"more":${p < 5},"results":[$items]}"""
    }
    val dir = Files.createTempDirectory("graft-json").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      bodies.mkString("\n").getBytes("UTF-8"))

    // S7: schema-first JSON doc loader
    val df = spark.read
      .schema("more BOOLEAN, results ARRAY<STRUCT<DocumentUrl: STRING, Title: STRING>>")
      .json(dir)
    assert(df.count() == 5)
    val viaSpark = df
      .select(posexplode(col("results")).as(Seq("i", "r")))
      .select(col("r.DocumentUrl"))
      .collect().map(_.getString(0)).toSet

    // S5: the engine's Jackson path over the same bodies (doc links only —
    // Outlinks adds the pagination link when more=true)
    val viaJackson = bodies.zipWithIndex.flatMap { case (b, i) =>
      Outlinks.extract(s"https://h.example.ir/search?page=${i + 1}", b)
        .map(_._1).filter(_.contains("IdeaId="))
    }.toSet
    assert(viaSpark == viaJackson)
    assert(viaSpark.size == 20)
  }

  test("Outlinks: IdeaId fallback for results without DocumentUrl; page-overflow guard") {
    // reference behavior (handler.py:314-315 → get_idea_page:273): a
    // listing item with no DocumentUrl is STILL fetched, by IdeaId against
    // the site's detail endpoint — it must not vanish from the crawl
    val body =
      """{"more":false,"results":[
        {"DocumentUrl":"/opinions/Detail?IdeaId=1","Title":"a"},
        {"IdeaId":"42","Title":"no-url"},
        {"DocumentUrl":"","IdeaId":"43","Title":"empty-url"},
        {"Title":"neither"}]}"""
    val links = Outlinks.extract("https://h.example.ir/search?page=2", body)
    assert(links.map(_._1) == Seq(
      "/opinions/Detail?IdeaId=1",
      "https://h.example.ir/opinions/Detail?IdeaId=42",
      "https://h.example.ir/opinions/Detail?IdeaId=43"))
    // discovery order → priorities keep the listing-position slots
    assert(links.map(_._2) == Seq(
      1 * Outlinks.PageBlock + 1, 1 * Outlinks.PageBlock + 2,
      1 * Outlinks.PageBlock + 3))

    // a page number past Int range must not NumberFormatException the
    // task (one pathological URL would abort the round job after retries)
    val huge = Outlinks.extract(
      "https://h.example.ir/search?page=99999999999", body)
    assert(huge.nonEmpty)
  }

  test("WARC source: framing round-trip, multi-member gzip files, byte-exact Content-Length") {
    import spark.implicits._
    import graft.sources.WarcSource
    import java.io.ByteArrayOutputStream
    import java.util.zip.GZIPOutputStream
    import java.nio.charset.StandardCharsets.UTF_8

    // bodies chosen to break char-vs-byte confusion: Persian + emoji text
    // where UTF-8 byte length != char count, plus raw binary
    val recs = Seq(
      ("response", "https://example.org/a", "متن فارسی با طول بایتی متفاوت"),
      ("response", "https://example.org/b", "emoji 😀 body"),
      ("metadata", "https://example.org/c", "plain ascii"))
    val framed = recs.map { case (t, u, body) =>
      WarcSource.frameRecord(t, u, "2026-01-01T00:00:00Z", "text/html",
        body.getBytes(UTF_8))
    }
    val blob = framed.reduce(_ ++ _)

    // 1) plain-bytes parse: every field + byte-exact body
    val parsed = WarcSource.parseStream(
      new java.io.ByteArrayInputStream(blob)).toSeq
    assert(parsed.size == 3)
    parsed.zip(recs).foreach { case (r, (t, u, body)) =>
      assert(r.record_type == t && r.target_uri == u)
      assert(r.content_length == body.getBytes(UTF_8).length)
      assert(new String(r.body, UTF_8) == body)
    }

    // 2) multi-member gzip FILE (one member per record — the Common Crawl
    //    layout) through the file surface
    val dir = Files.createTempDirectory("graft-warc").toString
    val gzBytes = {
      val out = new ByteArrayOutputStream()
      framed.foreach { f => // one gzip member per record
        val g = new GZIPOutputStream(out); g.write(f); g.finish(); g.close()
      }
      out.toByteArray
    }
    Files.write(java.nio.file.Paths.get(dir, "f1.warc.gz"), gzBytes)
    Files.write(java.nio.file.Paths.get(dir, "f2.warc"), blob)
    val viaFiles = WarcSource.read(spark, s"$dir/*").collect()
    assert(viaFiles.length == 6) // both files carry all 3 records
    assert(viaFiles.map(_.target_uri).toSet == recs.map(_._2).toSet)
    assert(viaFiles.count(_.record_type == "metadata") == 2)

    // 3) the distributed binary-column kernel: rows of multi-record blobs
    //    (one plain, one gz) parse identically
    val df = Seq(Tuple1(blob), Tuple1(gzBytes)).toDF("warc")
    val viaCol = WarcSource.parseRecords(spark, df, "warc").collect()
    assert(viaCol.length == 6)
    assert(viaCol.map(r => new String(r.body, UTF_8)).sorted.toSeq ==
      (recs.map(_._3) ++ recs.map(_._3)).sorted)

    // 4) corrupt framing fails LOUDLY (a bad length desyncs the stream —
    //    silence here would emit garbage records forever)
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n" +
      "\r\nshort").getBytes(UTF_8)
    intercept[Exception] {
      WarcSource.parseStream(new java.io.ByteArrayInputStream(bad)).toSeq
    }

    // 5) UTF-8 HEADER values (IRIs) survive the parse — header lines must
    //    decode as UTF-8, not byte-to-char latin-1 mojibake
    val iri = "https://example.org/متن/😀"
    val iriBlob = WarcSource.frameRecord("response", iri,
      "2026-01-01T00:00:00Z", "text/html", "x".getBytes(UTF_8))
    val iriRec = WarcSource.parseStream(
      new java.io.ByteArrayInputStream(iriBlob)).next()
    assert(iriRec.target_uri == iri, iriRec.target_uri)

    // 6) multi-member gzip on a stream whose available() lies (returns 0
    //    with data remaining — legal per the InputStream contract, typical
    //    of remote-FS streams): GZIPInputStream would silently stop after
    //    member 1 without openMaybeGz's optimistic-available wrapper
    val zeroAvail = new java.io.InputStream {
      val in = new java.io.ByteArrayInputStream(gzBytes)
      override def read(): Int = in.read()
      override def read(b: Array[Byte], o: Int, l: Int): Int = in.read(b, o, l)
      override def available(): Int = 0
    }
    val viaZero = WarcSource.parseStream(WarcSource.openMaybeGz(zeroAvail)).toSeq
    assert(viaZero.size == 3, s"multi-member gz truncated: got ${viaZero.size}")

    // 7) iterator contract: next() past exhaustion throws, never repeats
    //    the final record
    val one = WarcSource.parseStream(new java.io.ByteArrayInputStream(
      WarcSource.frameRecord("response", "u", "d", "t", "b".getBytes(UTF_8))))
    one.next()
    assert(!one.hasNext)
    intercept[NoSuchElementException] { one.next() }

    // 8) an implausible Content-Length fails with a bounded, clear error
    //    (never a multi-GB allocation / executor OOM)
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 2000000000\r\n\r\n").getBytes(UTF_8)
    val e = intercept[IllegalArgumentException] {
      WarcSource.parseStream(new java.io.ByteArrayInputStream(huge),
        maxRecordBytes = 1 << 20).toSeq
    }
    assert(e.getMessage.contains("implausible"), e.getMessage)

    // 9) a NULL blob row yields no records (not an NPE mid-stage)
    val withNull = Seq(Tuple1(blob), Tuple1(null.asInstanceOf[Array[Byte]]))
      .toDF("warc")
    assert(WarcSource.parseRecords(spark, withNull, "warc").count() == 3)

    // 10) a missing non-glob path fails with a named error (Hadoop
    //     globStatus returns null there, not an empty array)
    val fnf = intercept[java.io.FileNotFoundException] {
      WarcSource.read(spark, s"$dir/nope.warc.gz.missing")
    }
    assert(fnf.getMessage.contains("nope"), fnf.getMessage)
  }

  test("WARC writer: distributed export round-trips through read; empty partitions skip; overwrite clears stale shards") {
    import graft.sources.WarcSource
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"),
      (1L, "متن فارسی با ایموجی 🙂"), // byte length != char count
      (2L, ""), // empty body: Content-Length 0 round-trips
      (3L, "third doc body")
    ).toDF("doc_id", "text")
    val src = docs.select(
      concat(lit("https://e.org/"), $"doc_id").as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("ctype"),
      encode($"text", "UTF-8").as("body"))
    val want = docs.collect().map { r =>
      (s"https://e.org/${r.getLong(0)}",
        r.getString(1).getBytes("UTF-8").length.toLong, r.getString(1))
    }.toSet
    for (gz <- Seq(true, false)) {
      val out = Files.createTempDirectory("graft-warcw").toString + "/shards"
      // 8 partitions over 4 rows: at least 4 empty partitions write nothing
      WarcSource.write(src.repartition(8), out, gzip = gz)
      val glob = out + (if (gz) "/part-*.warc.gz" else "/part-*.warc")
      val back = WarcSource.read(spark, glob).collect()
        .map(r => (r.target_uri, r.content_length,
          new String(r.body, "UTF-8"))).toSet
      assert(back == want, s"gz=$gz")
      // no temp droppings survive a clean write; the job-level _SUCCESS
      // marker is present (published only after every partition committed)
      val names0 = new java.io.File(out).listFiles().map(_.getName).toSeq
      assert(names0.count(_.endsWith(".tmp")) == 0, names0.mkString(","))
      assert(names0.contains("_SUCCESS"), names0.mkString(","))
      // overwrite: a second write with ONE partition clears the old shards
      // (Hadoop's local FS writes hidden .crc sidecars — data files only)
      WarcSource.write(src.repartition(1), out, gzip = gz)
      val files = new java.io.File(out).listFiles().map(_.getName).toSeq
        .filter(_.startsWith("part-"))
      assert(files.size == 1, files.mkString(","))
      assert(WarcSource.read(spark, glob).count() == 4)
    }
  }

  test("WARC writer failure path: a mid-write task failure propagates, cleans its temp, and publishes no _SUCCESS") {
    import graft.sources.WarcSource
    import spark.implicits._
    val out = Files.createTempDirectory("graft-warcw-fail").toString + "/shards"
    // body column poisoned by a UDF that throws on one row: the write job
    // must FAIL (not return a partial export that looks complete)
    val boom = udf { (i: Long) =>
      if (i == 3L) throw new RuntimeException("poisoned row")
      s"body $i".getBytes("UTF-8")
    }
    val src = spark.range(0L, 8L, 1L, 4).toDF("i").select(
      concat(lit("https://e.org/"), $"i").as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("ctype"),
      boom($"i").as("body"))
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.write(src, out)
    }
    assert(e.getMessage != null)
    val names = Option(new java.io.File(out).listFiles())
      .map(_.map(_.getName).toSeq).getOrElse(Nil)
    // no job-level commit marker, no temp droppings from the failed task
    assert(!names.contains("_SUCCESS"), names.mkString(","))
    assert(names.count(_.endsWith(".tmp")) == 0, names.mkString(","))
  }
}

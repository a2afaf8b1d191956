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
}

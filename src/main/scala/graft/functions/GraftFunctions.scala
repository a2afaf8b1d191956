package graft.functions

import graft.extract.Extractor
import graft.ops.Sketches
import graft.text.JalaliDate
import graft.url.Urls
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** SQL-facing registration of the engine's scalar functions (SURVEY.md
  * §2.10: the extract/canonicalize/Jalali kernels "optionally also
  * registered via udf() for SQL access"). After `registerAll(spark)`:
  *
  *   SELECT extract_content(html_str), jalali_to_gregorian('1403/01/01'),
  *          url_key(url), url_host(url), simhash64(text), ...
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("extract_question",
      udf((html: String) => Extractor.extract("", "", html).question))
    spark.udf.register("extract_answer",
      udf((html: String) => Extractor.extract("", "", html).answer))
    spark.udf.register("extract_content",
      udf((html: String) => Extractor.extract("", "", html).content))
    spark.udf.register("is_valid_page",
      udf((html: String) => Extractor.isValidHtml(if (html == null) "" else html)))
    spark.udf.register("jalali_to_gregorian",
      udf((s: String) => JalaliDate.processDate(s)._2))
    spark.udf.register("jalali_normalize",
      udf((s: String) => JalaliDate.processDate(s)._1))
    spark.udf.register("canonical_url", udf((u: String) => Urls.canonicalize(u)))
    spark.udf.register("url_key", udf((u: String) => Urls.urlKey(u)))
    spark.udf.register("url_host", udf((u: String) => Urls.host(u)))
    spark.udf.register("idea_id", udf((u: String) => Urls.ideaId(u).orNull))
    spark.udf.register("simhash64",
      udf((t: String) => Sketches.simhash64(if (t == null) "" else t)))
    spark.udf.register("word_shingles",
      udf((t: String, k: Int) => Sketches.shingles(if (t == null) "" else t, k)))
  }
}

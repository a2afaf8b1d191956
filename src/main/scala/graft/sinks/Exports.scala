package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Export-side operators (SURVEY.md §2 K4/K5/K6) — the render-and-write
  * stages of the reference's exporter family, re-expressed as declarative
  * column maps + distributed writers:
  *
  *  - K4 `writeCsv` / `writeKeyValueText`: the CSV DictWriter rows and
  *    key:value text blocks of /root/reference/src/csv_export.py:356-392.
  *  - K5 `sections` / `renderHtmlDoc`: the doc→HTML render stage of
  *    /root/reference/src/html_export.py:30-304, including the ARA flavor's
  *    `content.split("##")` section decomposition
  *    (/root/reference/src/ara_converter.py:774-802).
  *  - K6 `chunkAssign` / `chunkedWrite`: the ≤N-docs-per-file chunked
  *    partitioned write of /root/reference/src/word_export.py:232,489-792.
  *
  * Everything row-level is a codegen'd Column expression (split, posexplode,
  * base64, format_string — §2.7 scalar surface); the writers are plain
  * distributed DataFrameWriter calls, so at 100 TB each executor renders and
  * writes its own partition with no driver funnel.
  */
object Exports {

  /** K4: header CSV export — one distributed write, standard quoting. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Render a row as the reference's "key: value" block (csv_export.py's
    * text flavor): one line per column, blank line after.
    */
  def keyValueBlock(cols: Seq[String]): Column =
    concat_ws("\n", cols.map(c =>
      concat(lit(c + ": "), coalesce(col(c).cast("string"), lit("")))) :+ lit(""): _*)

  /** K4: ordered key:value text-block export. A global orderBy gives
    * range-partitioned files whose concatenation in filename order is the
    * fully ordered document — the scalable analog of the reference's single
    * sequential text file.
    */
  def writeKeyValueText(df: DataFrame, cols: Seq[String], orderCol: String,
      path: String): Unit =
    df.orderBy(col(orderCol)).select(keyValueBlock(cols).as("value"))
      .write.mode("overwrite").text(path)

  /** Minimal HTML escaping (&, <, >, " — the four html.escape defaults). */
  def htmlEscape(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    val gt = regexp_replace(lt, ">", "&gt;")
    regexp_replace(gt, "\"", "&quot;")
  }

  /** K5 (ARA section op): split a `##`-delimited content column into
    * (idCol, section_idx, section_text) rows — ara_converter.py:774-802.
    */
  def sections(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(split(col(contentCol), "##")).as(Seq("section_idx", "section_text")))

  /** K5: doc→HTML render map. Title + per-`##`-section <div> blocks, all
    * escaped; a base64 content fingerprint rides along as a data attribute
    * (the §2.7 base64 surface — base64 of the 32-char md5, which stays
    * under the 76-char MIME line limit so no engine chunks it). Pure
    * codegen'd expression — render happens where the row lives.
    */
  def renderHtmlDoc(idCol: Column, titleCol: Column, contentCol: Column): Column =
    concat(
      lit("<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"><title>"),
      htmlEscape(titleCol),
      lit("</title></head>\n<body data-doc=\""), idCol.cast("string"),
      lit("\" data-fp=\""), base64(encode(md5(encode(contentCol, "UTF-8")), "UTF-8")),
      lit("\">\n"),
      concat_ws("\n", transform(split(contentCol, "##"),
        s => concat(lit("<div class=\"section\"><p>"), htmlEscape(s), lit("</p></div>")))),
      lit("\n</body></html>"))

  /** K6: assign each row a (key, chunk) pair so no chunk holds more than
    * `chunkSize` rows per key — word_export.py's ≤999-docs-per-file rule as
    * a window expression.
    *
    * CONTRACT: `orderCol` must be unique within each key (the exporters
    * order by a unique doc id). With ties, row_number is
    * shuffle-order-dependent, so a boundary row could land in different
    * chunk directories across runs/task retries — non-reproducible output.
    * Same contract applies to [[writeKeyValueText]]'s global order.
    */
  def chunkAssign(df: DataFrame, keyCol: String, orderCol: String,
      chunkSize: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("chunk",
      ((row_number().over(w) - 1) / chunkSize).cast("int"))
  }

  /** K6: the chunked partitioned write itself — one directory per
    * (key, chunk), each holding ≤ chunkSize rows.
    */
  def chunkedWrite(df: DataFrame, keyCol: String, orderCol: String,
      chunkSize: Int, path: String): Unit =
    chunkAssign(df, keyCol, orderCol, chunkSize)
      .write.mode("overwrite").partitionBy(keyCol, "chunk").parquet(path)
}

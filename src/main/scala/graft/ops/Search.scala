package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic scored text retrieval — the reference's primary READ path
  * re-expressed Spark-native: every exporter flows through an ES bool/should
  * of per-field match_phrase clauses with field boosts question:5 answer:3
  * content:2, a min_score floor, and score-desc ordering
  * (/root/reference/src/elasticsearch_service.py:418-436,462-476; consumed
  * by html_converter/csv exporters). ES scores each clause with the field's
  * own BM25 statistics and sums matched clauses; this operator keeps that
  * shape (per-field BM25, boost-weighted sum over fields and query terms)
  * while staying fully deterministic and SQL-expressible — hence
  * DuckDB-oraclable, which an opaque Lucene score never is.
  *
  * Scale shape (100 TB): corpus statistics (tf, doc length, docfreq) are
  * ONE tokenize pass + hash partial-aggregations. Query terms are a
  * broadcast (queries are human-sized), so the candidate join filters the
  * big tf table map-side — no corpus shuffle keyed on anything but the
  * aggregation itself; per-term docfreq joins are broadcasts of
  * query-term-only slices. Only matched candidates reach the doc-length
  * join and the per-query top-k window.
  */
object Search {

  /** A searchable field and its boost (reference: question 5 / answer 3 /
    * content 2, elasticsearch_service.py:431-435).
    */
  final case class Field(name: String, boost: Double)

  /** BM25-scored top-k per query over multi-field documents.
    *
    * score(q, d) = Σ_fields Σ_{t ∈ q} boost_f · idf_f(t) · tf-sat_f(t, d)
    * with idf = ln(1 + (N - df + 0.5)/(df + 0.5)) and
    * tf-sat = tf·(k1+1) / (tf + k1·(1 - b + b·len/avglen)) — the Lucene
    * BM25 form. Scores are rounded to 6 decimals BEFORE the min_score
    * filter and the per-query rank so results are engine-reproducible;
    * ties break on doc id.
    *
    * @param docs    one row per document with `idCol` + one column per field
    * @param queries (queryIdCol, queryTextCol) — whitespace-tokenized bag
    *                of terms (phrase positions are out of scope; the -ish)
    */
  def bm25TopK(
      docs: DataFrame,
      fields: Seq[Field],
      queries: DataFrame,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext",
      k: Int = 10,
      minScore: Double = 0.0,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val scored = bm25Scored(docs, fields, queries, idCol, queryIdCol,
      queryTextCol, k1, b)
      .filter(col("score") >= minScore)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as(queryIdCol), col("id").as(idCol),
        col("score"), col("rank"))
  }

  /** Per-query envelope of the reference's batch search stream
    * (elasticsearch_service.py:487-560): `total_count` = hits clearing the
    * min_score floor (ES `track_total_hits` with `min_score` applied),
    * `relevant_count` = rows the stream actually yields after the
    * max_results cap, `max_score` for the caller's score-tier picker
    * (html_converter.py:433-437 tiers min_score by the query's phrase
    * count). One hash aggregation over the scored candidates — no window,
    * no per-query scroll.
    */
  def bm25QueryStats(
      docs: DataFrame,
      fields: Seq[Field],
      queries: DataFrame,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext",
      maxResults: Int = 100,
      minScore: Double = 0.0,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val stats =
      bm25Scored(docs, fields, queries, idCol, queryIdCol, queryTextCol, k1, b)
        .filter(col("score") >= minScore)
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("__tc"), round(max(col("score")), 6).as("__ms"))
    // EVERY query gets an envelope row — a no-hit query reports
    // (total_count = 0, relevant_count = 0, max_score = null), matching the
    // reference stream's per-query summary (ES track_total_hits with
    // min_score yields 0, max_score null); dropping the row would make a
    // stats consumer silently under-report the query set
    queries.select(col(queryIdCol).as("qid")).distinct()
      .join(stats, Seq("qid"), "left")
      .select(col("qid").as(queryIdCol),
        coalesce(col("__tc"), lit(0L)).as("total_count"),
        least(coalesce(col("__tc"), lit(0L)), lit(maxResults.toLong))
          .as("relevant_count"),
        col("__ms").as("max_score"))
  }

  /** Shared scoring core: (qid, id, score) for every (query, doc) pair with
    * at least one matching term, score rounded to 6 decimals.
    */
  private def bm25Scored(
      docs: DataFrame,
      fields: Seq[Field],
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      queryTextCol: String,
      k1: Double,
      b: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // long-format token stream: one row per (field, doc, token occurrence)
    val tok = fields.map { f =>
      docs.select(col(idCol).as("id"), lit(f.name).as("field"),
        explode(split(lower(col(f.name)), " ")).as("term"))
    }.reduce(_ unionAll _).filter(length(col("term")) > 0)

    val tf = tok.groupBy("field", "id", "term").agg(count(lit(1)).as("tf"))
    val dlen = tok.groupBy("field", "id").agg(count(lit(1)).as("dl"))
    val avgl = dlen.groupBy("field").agg(avg(col("dl")).as("avgdl"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val boosts = fields.map(f => (f.name, f.boost)).toDF("field", "boost")

    val qterms = queries.select(col(queryIdCol).as("qid"),
        explode(split(lower(col(queryTextCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)

    // docfreq restricted to query terms before it is broadcast: the full
    // vocabulary is corpus-sized, the query-term slice is human-sized
    val qstats = tf.groupBy("field", "term").agg(count(lit(1)).as("df"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))

    val joined = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(qstats), Seq("field", "term"))
      .join(dlen, Seq("field", "id"))
      .join(broadcast(avgl), Seq("field"))
      .join(broadcast(boosts), Seq("field"))
      .crossJoin(broadcast(nDocs))

    val idf = F.log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfSat = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

    joined
      .withColumn("ts", col("boost") * idf * tfSat)
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("ts")).as("score_raw"))
      .withColumn("score", round(col("score_raw"), 6))
      .select(col("qid"), col("id"), col("score"))
  }
}

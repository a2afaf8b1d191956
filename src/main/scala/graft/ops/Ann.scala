package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) — replaces the
  * reference's ES dense_vector kNN (/root/reference/src/
  * elasticsearch_service.py:339-369, cosine / HNSW) with Spark-native
  * plans: brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane) bucketed variant as the 100 TB scale path.
  *
  * Dot products use built-in higher-order functions (zip_with + aggregate)
  * in double precision — codegen'd, no UDF.
  */
object Ann {

  /** cosine(a, b) as a double Column over two array<float> columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Exact brute-force top-k neighbors for each query id: broadcast the
    * (small) query set against the full corpus, rank per query. The corpus
    * side streams — never collected — so this scales to any corpus size;
    * cost is |corpus| × |queries| dot products.
    */
  def bruteForceTopK(
      corpus: DataFrame, // (id, embedding)
      queries: DataFrame, // (qid, q_embedding)
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("cos", cosine(col("v"), col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Random-hyperplane signature: bit i = sign(v · h_i) where h_i is a
    * deterministic pseudo-random hyperplane derived from (seed, i, dim) —
    * reproducible across runs with no stored model.
    */
  def rhpSignature(vecCol: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    val vd = transform(vecCol, x => x.cast("double"))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, b) => {
        // h_i components: hash-derived pseudo-gaussian-ish in [-1, 1]
        val dot = aggregate(
          zip_with(vd, sequence(lit(0), lit(dim - 1)),
            (x, j) => x * (pmod(xxhash64(b, j, lit(seed)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
          lit(0.0), (s, v) => s + v)
        acc.bitwiseOR(when(dot > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
      })
  }

  /** LSH-bucketed approximate neighbor candidates: vectors sharing any of
    * `tables` signature bands become candidates; exact cosine verifies.
    * At scale this replaces the |corpus|² / broadcast join with shuffles
    * keyed on (table, band-signature).
    */
  def lshCandidatePairs(
      corpus: DataFrame,
      bits: Int = 16,
      tables: Int = 4,
      dim: Int = 64,
      minCosine: Double = 0.7,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    // one signature per (vector, table): explode the table index so each
    // table uses distinct hash-derived hyperplanes
    val exploded = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(spark_table(tables))
      .withColumn("sig", rhpSignatureDynamic(col("v"), bits, dim, col("t"), seed))
    val l = exploded.select(col("t"), col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val r = exploded.select(col("t"), col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  private def spark_table(tables: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.range(tables).toDF("t")
  }

  /** rhpSignature with the table index folded into the hyperplane hash. */
  private def rhpSignatureDynamic(vecCol: Column, bits: Int, dim: Int,
      tCol: Column, seed: Long): Column = {
    val vd = transform(vecCol, x => x.cast("double"))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, b) => {
        val dot = aggregate(
          zip_with(vd, sequence(lit(0), lit(dim - 1)),
            (x, j) => x * (pmod(xxhash64(b, j, tCol, lit(seed)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
          lit(0.0), (s, v) => s + v)
        acc.bitwiseOR(when(dot > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
      })
  }
}

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

  /** LSH (random-hyperplane) approximate neighbor candidates: vectors
    * sharing a signature in any of `tables` hash tables become candidates;
    * exact cosine verifies. Hyperplanes are deterministic from the seed,
    * generated driver-side (KBs) and broadcast; per-row signatures run in a
    * typed flatMap (tight loops — nested Catalyst lambdas are interpreted).
    *
    * Shuffle shape (the 100 TB contract, same as Dedup.minhashLshPairs):
    * the band self-join carries ONLY (table, signature, id) triples — at
    * 3072-dim × many tables, shipping vectors through the join would
    * multiply shuffle volume by tables × dim. Vectors are re-joined from
    * the corpus only for the DEDUPED candidate pairs' verify step.
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
    val spark = corpus.sparkSession
    import spark.implicits._
    val planes = Sketches.hyperplanes(tables, bits, dim, seed)
    val planesB = spark.sparkContext.broadcast(planes)

    val vecs = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    val signed = vecs
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val p = planesB.value
        (0 until p.length).iterator.map(t => (t, Sketches.rhpSignature(v, p(t)), id))
      }
      .toDF("t", "sig", "id")

    val l = signed.select(col("t"), col("sig"), col("id").as("id_a"))
    val r = signed.select(col("t"), col("sig"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (idA, idB, vA, vB) => (idA, idB, Sketches.cosine(vA, vB)) }
      .toDF("id_a", "id_b", "cosine")
      .filter(col("cosine") >= minCosine)
      .withColumn("cosine", round(col("cosine"), 6))
  }
}

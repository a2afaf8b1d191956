package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder-prompt first-class components; reference analogs: the exact
  * duplicate-key detection + keep-first delete of
  * /root/reference/src/dedupe_id_ara.py:66-217).
  *
  * All operators are declarative DataFrame plans: hash-partial aggregation,
  * window keep-first, and LSH band self-joins — no driver-side loops, no
  * collect; at 100 TB the band join shuffles only (band, signature) pairs.
  */
object Dedup {

  /** Exact duplicate groups by content hash (A1 generalized):
    * groupBy(hash).count >= 2.
    */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col("doc_id")).as("keep_id"))
      .filter(col("dup_count") >= 2)

  /** Keep-first dedup (W1 made deterministic): one row per content hash,
    * lowest id wins — reference kept ES's arbitrary first hit
    * (dedupe_id_ara.py:183-188); we fix the tiebreak.
    */
  def exactKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Normalized word shingles of size k as a deduplicated array column. */
  def shingles(textCol: Column, k: Int): Column = {
    val words = split(lower(textCol), "\\W+")
    // sliding k-grams via transform over indices
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
        i => array_join(slice(words, i + 1, lit(k)), " ")),
      s => length(s) > 0))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions take
    * the min over shingle hashes. Pure built-in columns (xxhash64 + array
    * transforms) — whole-stage codegen, no UDF.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(s, i))))

  /** MinHash + LSH banding candidate pairs with verified shingle-Jaccard.
    *
    * shingle → minhash (numHashes) → split into bands → hash each band →
    * self-join on (band_idx, band_hash) → distinct candidate pairs →
    * verify exact Jaccard over shingle sets ≥ threshold.
    *
    * At scale: the self-join shuffles only (band, hash, id); the verify
    * join re-fetches shingles for candidates only.
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3): DataFrame = {
    val rows = bands // rows per band = numHashes / bands
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = withSig
      .select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(
            transform(sequence(lit(0), lit(rowsPerBand - 1)),
              r => element_at(col("sig"), b * rowsPerBand + r + 1)), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val left = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))

    val candidates = left.join(right, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by token
    * hash bits; sign → bit. Computed with built-in array ops (codegen).
    */
  def simhash(textCol: Column): Column = {
    val tokens = filter(split(lower(textCol), "\\W+"), t => length(t) > 0)
    val hashes = transform(tokens, t => xxhash64(t))
    // for each bit b: sum over tokens of (bit set ? 1 : -1); >0 → set bit
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc.bitwiseOR(
        when(
          aggregate(hashes, lit(0),
            (s, h) => s + when(call_function("shiftright", h, b)
              .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
            > 0,
          call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))))
  }

  /** SimHash near-dup candidate pairs: split the 64-bit hash into 4
    * 16-bit blocks (two identical blocks ⇒ hamming ≤ ~32 candidates);
    * verify hamming distance ≤ maxHamming via bit_count(xor).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withHash = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh64"))
    val blocked = withHash.select(col("id"), col("sh64"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh64"), b * 16).bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "block_val")
    val l = blocked.select(col("block"), col("block_val"), col("id").as("id_a"), col("sh64").as("h_a"))
    val r = blocked.select(col("block"), col("block_val"), col("id").as("id_b"), col("sh64").as("h_b"))
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram (character) Jaccard similarity for candidate pairs below
    * a size cap — the small-scale oracle-checkable variant.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val chars = (c: Column) => split(c, "")
    val gramsOf = (c: Column) => array_distinct(filter(
      transform(sequence(lit(0), greatest(length(c) - n, lit(0))),
        i => array_join(slice(chars(c), i + 1, lit(n)), "")),
      g => length(g) === n))
    val withGrams = df.select(col(idCol).as("id"),
      gramsOf(lower(col(textCol))).as("grams"))
    val l = withGrams.select(col("id").as("id_a"), col("grams").as("g_a"))
    val r = withGrams.select(col("id").as("id_b"), col("grams").as("g_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}

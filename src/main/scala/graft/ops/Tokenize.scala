package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus tokenization — the stage a training-data pipeline runs on
  * `Curation.curate`'s survivors (builder-prompt first-class surface;
  * reference analog: the token budgeting around the embedding client,
  * /root/reference/src/processor.py:199 + embedding.py:24, which counts
  * but never materializes ids — a training pipeline needs the ids).
  *
  * Two declarative stages, both 100 TB-shaped:
  *  - [[buildVocab]]: one tokenize pass + hash partial-aggregation, rank
  *    by (count desc, token) — deterministic ids, ties broken
  *    lexicographically. The vocab is human-scale (top-N), the corpus
  *    never shuffles except the (token) aggregation itself.
  *  - [[encode]]: posexplode + broadcast vocab join + re-assemble in
  *    position order. Out-of-vocab tokens map to `unkId` (id 0 by
  *    convention here, real ids start at 1). The only wide operation is
  *    the per-document re-assembly groupBy, keyed on the document id —
  *    the same key the corpus is already laid out by.
  */
object Tokenize {

  /** Top-`vocabSize` whitespace tokens as (token, token_id, n_occurrences),
    * ids 1..vocabSize assigned by (count desc, token asc) — fully
    * deterministic, so two runs (or two engines) agree exactly.
    *
    * The global rank is a partitionless window — one task — so it must
    * never see the raw distinct-token table (billions of rows at web
    * scale). Two exact pre-prunes bound its input:
    *  - `minCount` drops the long tail before any ranking (default 1 =
    *    keep all, the oracle configuration);
    *  - a per-hash-partition rank keeps ≤ `vocabSize` candidates from each
    *    of `prePartitions` hash groups — the global top-N is necessarily
    *    in the top-N of its own partition, so at most
    *    prePartitions·vocabSize rows reach the single-task window.
    */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      minCount: Long = 1L, prePartitions: Int = 64): DataFrame = {
    val counts = docs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
    val wp = Window.partitionBy(col("__vpart"))
      .orderBy(col("n_occurrences").desc, col("token"))
    val pruned = counts
      .withColumn("__vpart", pmod(xxhash64(col("token")), lit(prePartitions.toLong)))
      .withColumn("__prank", row_number().over(wp))
      .filter(col("__prank") <= vocabSize)
      .drop("__vpart", "__prank")
    val w = Window.orderBy(col("n_occurrences").desc, col("token"))
    pruned
      .withColumn("token_id", row_number().over(w))
      .filter(col("token_id") <= vocabSize)
      .select(col("token"), col("token_id"), col("n_occurrences"))
  }

  /** Encode each document as array<int> of vocab ids (OOV → `unkId`),
    * preserving token order. The vocab side is broadcast (top-N is always
    * small); the corpus explodes, joins map-side, and reassembles grouped
    * by its own id — no corpus-wide shuffle beyond that groupBy.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, unkId: Int = 0): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    toks
      .join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .withColumn("tid", coalesce(col("token_id"), lit(unkId)))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("tid")))).as("ordered"))
      .select(col(idCol),
        transform(col("ordered"), x => x.getField("tid")).as("token_ids"))
  }

  /** encode + per-doc stats in one result: (id, token_ids, n_tokens,
    * n_unk) — the budget/oov columns every downstream consumer filters on
    * (F3's shape over ids instead of text).
    */
  def encodeWithStats(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, unkId: Int = 0): DataFrame =
    encode(docs, textCol, idCol, vocab, unkId)
      .select(col(idCol), col("token_ids"),
        size(col("token_ids")).as("n_tokens"),
        size(filter(col("token_ids"), x => x === unkId)).as("n_unk"))

  /** Split encoded documents into fixed-length training chunks — the
    * long-document step before batching: one row per window of `seqLen`
    * ids, consecutive windows sharing `overlap` ids (stride =
    * seqLen - overlap, starts at 0, stride, 2·stride, …; the tail chunk is
    * shorter and kept only if ≥ `minLen`). Fully declarative:
    * posexplode(sequence) over the per-doc chunk count + a positional
    * slice — codegen'd, no UDF, no shuffle at all (chunking is
    * embarrassingly row-local; the explode multiplies rows in place).
    * Output: (idCol, chunk_idx, token_ids).
    */
  def chunkForTraining(encoded: DataFrame, idCol: String, seqLen: Int,
      overlap: Int = 0, minLen: Int = 1): DataFrame = {
    require(overlap >= 0 && overlap < seqLen, "need 0 <= overlap < seqLen")
    require(minLen >= 1 && minLen <= seqLen, "need 1 <= minLen <= seqLen")
    val stride = seqLen - overlap
    // last start index: 0 for docs within one window; else ceil((n-seqLen)/
    // stride) — a start past that yields a window fully CONTAINED in the
    // previous one (its tail adds no new tokens, only duplicated training
    // data), so it must not be emitted regardless of minLen
    val maxIdx = when(col("__n") <= lit(seqLen), lit(0L))
      .otherwise(floor((col("__n") - lit(seqLen) + lit(stride - 1)) / lit(stride))
        .cast("long"))
    encoded
      .withColumn("__n", size(col("token_ids")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("token_ids"),
        posexplode(sequence(lit(0L), maxIdx)))
      .withColumn("chunk_idx", col("pos").cast("int"))
      .withColumn("__start", (col("col") * lit(stride)).cast("int"))
      .withColumn("__chunk", slice(col("token_ids"), col("__start") + 1, lit(seqLen)))
      .filter(size(col("__chunk")) >= minLen)
      .select(col(idCol), col("chunk_idx"), col("__chunk").as("token_ids"))
  }

  /** GPT-style sequence packing: conceptually concatenate every document's
    * token ids in `idCol` order (appending `eosId` after each doc when
    * set), then cut the single global stream into consecutive `seqLen`-id
    * training sequences — documents cross sequence boundaries, no padding
    * is ever emitted, and the one partial tail sequence is kept only if
    * ≥ `minLen`. Output: (seq_idx, token_ids). Empty documents are dropped
    * (they would contribute only a separator).
    *
    * The result is a pure function of the input — the internal bucketing
    * below never affects which id lands in which sequence.
    *
    * Scale shape — the global concatenation is a distributed prefix sum,
    * never a partitionless window:
    *  1. the NARROW (id, length) projection is range-bucketed by id;
    *     per-bucket token totals (one row per bucket) come to the driver —
    *     the k-means-centroid-sized collect this repo allows — and the
    *     exclusive bucket base offsets broadcast back.
    *  2. within-bucket running sums use a window PARTITIONED by bucket
    *     (`prefixBuckets`-way parallel; a partitionless window over the
    *     corpus would be one task at 100 TB).
    *  3. offsets rejoin the token arrays on idCol — the key `encode`'s
    *     groupBy already laid the corpus out by — and each doc posexplodes
    *     into the ≤ ⌈n/seqLen⌉+1 sequences it overlaps, slicing its
    *     contribution per sequence. One final exchange on seq_idx
    *     reassembles; token arrays transit exactly that one shuffle plus
    *     the offset join.
    */
  def packSequences(encoded: DataFrame, idCol: String, seqLen: Int,
      eosId: Option[Int] = None, minLen: Int = 1,
      prefixBuckets: Int = 32): DataFrame = {
    require(seqLen >= 1 && minLen >= 1 && minLen <= seqLen,
      "need 1 <= minLen <= seqLen")
    val spark = encoded.sparkSession
    import spark.implicits._
    val L = seqLen.toLong
    val docs = encoded.filter(size(col("token_ids")) > 0)
    val withToks = eosId match {
      case Some(e) => docs.withColumn("__toks",
        concat(col("token_ids"), array(lit(e))))
      case None => docs.withColumn("__toks", col("token_ids"))
    }
    // phase 1: exact global offsets over the narrow (id, n) projection.
    // The projection is checkpointed BEFORE the range repartition:
    // repartitionByRange SAMPLES its child for split boundaries and then
    // shuffles it, so a live `encoded` pipeline (explode + vocab join +
    // reassembly) would be evaluated twice here and a third time by the
    // phase-2 join — with the narrow checkpoint the sampling and shuffle
    // read (id, n) rows and the input pipeline runs once for phase 1.
    val narrow0 = withToks
      .select(col(idCol), size(col("__toks")).cast("long").as("__n"))
      .localCheckpoint(true)
    // localCheckpoint pins the range bucketing so the totals job and the
    // window job cannot disagree on spark_partition_id (correctness does
    // not depend on the split points, but the two uses must share them).
    val narrow = narrow0
      .repartitionByRange(prefixBuckets, col(idCol))
      .withColumn("__b", spark_partition_id())
      .localCheckpoint(true)
    val totals = narrow.groupBy(col("__b")).agg(sum(col("__n")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive base for bucket b = sum of totals of buckets < b
    val baseByBucket = totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, t)) => acc + t }.init)
    val baseDf = broadcast(baseByBucket.toSeq.toDF("__b", "__base"))
    val wB = Window.partitionBy(col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = narrow
      .withColumn("__local", coalesce(sum(col("__n")).over(wB), lit(0L)))
      .join(baseDf, "__b")
      .select(col(idCol), (col("__local") + col("__base")).as("__off"))
    // phase 2: each doc contributes a slice to every sequence it overlaps
    val pieces = withToks
      .join(offsets, idCol)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .select(col("__toks"), col("__off"), col("__n"),
        posexplode(sequence(floor(col("__off") / L),
          floor((col("__off") + col("__n") - lit(1L)) / L))).as(Seq("__p", "__k")))
      .withColumn("__ls", greatest(col("__k") * L - col("__off"), lit(0L)))
      .withColumn("__le", least((col("__k") + lit(1L)) * L - col("__off"), col("__n")))
      .select(col("__k"), col("__off"),
        slice(col("__toks"), (col("__ls") + 1).cast("int"),
          (col("__le") - col("__ls")).cast("int")).as("__piece"))
    pieces
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(struct(col("__off"), col("__piece")))).as("__o"))
      // seq_idx stays LONG: the design-point corpus (100 TB / seqLen 2048)
      // packs ~10^10 sequences — an int cast wraps past 2.1e9 and aliases
      // training sequences
      .select(col("__k").as("seq_idx"),
        flatten(transform(col("__o"), x => x.getField("__piece"))).as("token_ids"))
      .filter(size(col("token_ids")) >= minLen)
  }

  /** A trained byte-pair-encoding model (Sennrich et al. 2016,
    * arXiv:1508.07909 — "Neural Machine Translation of Rare Words with
    * Subword Units", the public algorithm every GPT/Llama tokenizer
    * descends from).
    *
    * @param merges   learned merge rules in rank order (left, right,
    *                 pair_count at learn time) — human-scale (numMerges
    *                 entries), held on the driver like k-means centroids.
    * @param segments memoized (word, syms) segmentation of every TRAINING
    *                 word under the full merge sequence — the distributed
    *                 lookup table that lets encode skip merge replay for
    *                 every word seen in training.
    * @param vocab    (symbol, token_id): sorted base alphabet first, then
    *                 merged symbols in rank order; deterministic ids.
    * @param trainIterations  Spark-iteration count the trainer actually
    *                 ran (each = one pair-count job + one batch fold) —
    *                 the batched trainer's scale evidence: merges.size /
    *                 trainIterations is the achieved batch factor.
    */
  final case class BpeModel(merges: Seq[(String, String, Long)],
      segments: DataFrame, vocab: DataFrame, eow: String,
      trainIterations: Int = 0)

  /** Greedy left-to-right single-merge application — the classic BPE
    * recurrence (acc ends with `l` and the next symbol is `r` → replace
    * the tail with the merged symbol), expressed as an array fold so it
    * runs inside codegen on the distributed word table. `get` (not
    * element_at) keeps the empty-accumulator probe null-safe under ANSI.
    * Per-element accumulator copies make this O(m²) in SYMBOLS PER WORD —
    * words are short (m ≲ 40), never documents, so the quadratic is
    * harmless by construction (contrast the O(doc²) HOF-capture trap,
    * CharLm.charNgrams).
    */
  private def applyMergeCol(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The same recurrence on the driver/executor side, for the typed
    * unseen-word replay kernel and the specs' reference implementation.
    */
  private[graft] def foldMergeLocal(s: Vector[String], l: String,
      r: String): Vector[String] =
    s.foldLeft(Vector.empty[String])((acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x)

  /** (word, wc, syms): the distinct-word frequency table with each word
    * split to code-point symbols + the end-of-word marker. This is the
    * ONLY corpus-wide pass BPE training makes — every training iteration
    * afterwards touches just this vocabulary-sized table.
    */
  private def initialSegs(docs: DataFrame, textCol: String,
      eow: String): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"),
        concat(filter(split(col("word"), ""), s => length(s) > 0),
          array(lit(eow))).as("syms"))

  /** Adjacent-symbol pair counts weighted by word frequency — one
    * map-side-combining aggregation over the word table; pairs build
    * array-locally via zip_with over a shifted copy (arguments evaluated
    * once — no per-element re-split).
    */
  private def symPairCounts(segs: DataFrame): DataFrame =
    segs
      .select(col("wc"), explode(filter(
        zip_with(col("syms"),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r"))),
        p => p.getField("r").isNotNull)).as("p"))
      .groupBy(col("p").getField("l").as("left_sym"),
        col("p").getField("r").as("right_sym"))
      .agg(sum(col("wc")).as("pair_count"))

  /** First-iteration pair counts over the raw character segmentation —
    * the auditable (and DuckDB-oraclable) first step of [[bpeTrain]].
    * Output: (left_sym, right_sym, pair_count).
    */
  def bpePairCounts(docs: DataFrame, textCol: String,
      eow: String = "</w>"): DataFrame =
    symPairCounts(initialSegs(docs, textCol, eow))

  /** Safe batched-merge selection — the production-vocab scale path that
    * keeps the trained model EXACTLY equal to the classic sequential
    * algorithm's. Given this iteration's pair table prefix `top` (already
    * in the sequential tiebreak order: count desc, left asc, right asc)
    * and the CURRENT symbol alphabet, returns the longest prefix of the
    * sequential merge sequence provably derivable without recounting.
    *
    * Applying merge (a,b) changes the count of exactly the pairs with
    * right = a or left = b (their occurrences can be consumed), deletes
    * (a,b), and creates pairs involving the new symbol ab — each new
    * pair's count is bounded by some consumed pair's count (an occurrence
    * of x·ab was an occurrence of (x,a)). So a walk down `top` can keep
    * selecting while a candidate
    *  - does not INTERACT with an earlier selection (its right symbol is
    *    no selected left, its left no selected right, and it touches no
    *    selected output symbol — also makes batch occurrences
    *    token-disjoint, so one fold applies all of them),
    *  - does not ALIAS: its concatenated output must not equal an existing
    *    or just-created symbol (string concatenation can collide, and an
    *    aliased output would silently add occurrences to existing pairs —
    *    exactly as it does in the classic algorithm, which is why the
    *    aliasing case must fall back to the sequential step),
    * and stops at the first violation. The batch is then TRIMMED to pairs
    * with count STRICTLY above the stop pair's count and the last
    * collected count (covering interacting/unseen pairs below the prefix):
    * every pair a selected merge can create or grow sits at or below that
    * bound, so at each step of the batch the sequential argmax is exactly
    * the next selected pair. `exhaustive` = `top` is the WHOLE live pair
    * table — then a walk with no violation needs no trim (no unseen
    * interacting pair exists to spawn anything).
    *
    * Empty after trim → the caller falls back to the single argmax, which
    * is always exact. Symbols containing a space are never batched (the
    * batch kernel's map key is space-separated; \s+ tokenization means no
    * standard symbol can contain one, but eow is caller-chosen).
    */
  private[graft] def selectMergeBatch(top: Seq[(String, String, Long)],
      alphabet: Set[String], exhaustive: Boolean = false)
      : Seq[(String, String, Long)] =
    selectMergeBatchEx(top, alphabet, exhaustive)._1

  /** [[selectMergeBatch]] plus the window-limited flag: true iff the walk
    * consumed the whole prefix WITHOUT a violation while `exhaustive` was
    * false — the one case where a wider fetch window could have proven a
    * longer batch (a violation stop is corpus-structural: no window size
    * changes where the first interaction/alias sits).
    */
  private[graft] def selectMergeBatchEx(top: Seq[(String, String, Long)],
      alphabet: Set[String], exhaustive: Boolean)
      : (Seq[(String, String, Long)], Boolean) = {
    if (top.isEmpty) return (Nil, false)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val lefts = scala.collection.mutable.Set.empty[String]
    val rights = scala.collection.mutable.Set.empty[String]
    val outs = scala.collection.mutable.Set.empty[String]
    var stopCount = top.last._3
    var stopped = false
    val it = top.iterator
    while (!stopped && it.hasNext) {
      val p = it.next()
      val (l, r, c) = p
      val merged = l + r
      val interacts = lefts.contains(r) || rights.contains(l) ||
        outs.contains(l) || outs.contains(r)
      val alias = alphabet.contains(merged) || outs.contains(merged)
      val nulHazard = l.indexOf(' ') >= 0 || r.indexOf(' ') >= 0
      if (interacts || alias || nulHazard) { stopCount = c; stopped = true }
      else { selected += p; lefts += l; rights += r; outs += merged }
    }
    if (!stopped && exhaustive) (selected.toSeq, false)
    else (selected.takeWhile(_._3 > stopCount).toSeq, !stopped)
  }

  /** One-pass batched variant of [[applyMergeCol]]: applies every merge of
    * a [[selectMergeBatch]] batch in a single fold. Batch members are
    * pairwise non-interacting, so their occurrences are token-disjoint —
    * at most one rule matches at any position and in-batch application
    * order cannot matter. Lookup is an O(1) map literal keyed "l r"
    * (space-bearing symbols never reach a batch, see selectMergeBatch).
    */
  private def applyMergeBatchCol(syms: Column,
      batch: Seq[(String, String)]): Column = batch match {
    case Seq((l, r)) => applyMergeCol(syms, l, r)
    case _ =>
      val kv = batch.flatMap { case (l, r) =>
        Seq(lit(l + " " + r), lit(l + r)) }
      val m = map(kv: _*)
      aggregate(syms, array().cast("array<string>"), (acc, x) => {
        def merged = when(get(acc, size(acc) - 1).isNotNull,
          try_element_at(m,
            concat(get(acc, size(acc) - 1), lit(" "), x)))
        when(merged.isNotNull,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))
      })
  }

  /** Distributed BPE training, EXACT and batched. The corpus is read once
    * (word-frequency aggregation); each iteration then runs on the
    * distinct-word table only: one pair-count aggregation with a
    * TakeOrdered(`maxBatch`) prefix to the driver (the tiebreak order —
    * count desc, left, right — is fully deterministic), a driver-side
    * [[selectMergeBatch]] proving the longest recount-free prefix of the
    * SEQUENTIAL merge sequence, and ONE fold applying the whole batch.
    * The model is byte-identical to the classic one-merge-per-pass
    * algorithm's (parity-spec'd); batching only changes the job count.
    * Stops early when no pair reaches `minPairCount`. Lineage is flattened
    * with localCheckpoint every `checkpointEvery` iterations so plan depth
    * stays bounded at any numMerges.
    *
    * Scale contract: a production 32k-merge vocab is
    * O(numMerges / achieved-batch) sequential Spark jobs, NOT O(numMerges)
    * — on natural text the top of the pair table is dominated by
    * non-interacting pairs, so achieved batches are typically tens
    * (BpeModel.trainIterations records the real factor). The fetch window
    * ADAPTS: it doubles (up to `maxBatchCap`) whenever the selection walk
    * consumed the whole fetched prefix without a violation — the signal
    * that the window, not the corpus, limited the batch — and halves back
    * toward `maxBatch` when violations keep batches small relative to the
    * window (adversarial tie-dense corpora), so the driver never keeps
    * fetching thousands of rows it can't use.
    * Correctness never depends on the window: selection proves the same
    * sequential prefix at any size. `maxBatch = 1` recovers the classic
    * one-merge-per-job loop and disables adaptation. At 100 TB the word table
    * is large but vocabulary-shaped (10⁷-10⁸ rows), orders of magnitude
    * below the corpus; nothing per-iteration touches documents, and
    * per-iteration driver traffic is ≤ maxBatch rows. The base alphabet
    * (charset-bounded, the CharLm justification) is collected once to
    * assign deterministic vocab ids.
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, eow: String = "</w>",
      checkpointEvery: Int = 8, maxBatch: Int = 64,
      maxBatchCap: Int = 1024): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    require(maxBatchCap >= 1, "maxBatchCap must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var segs = initialSegs(docs, textCol, eow).localCheckpoint(true)
    val alphabet = segs
      .select(explode(col("syms")).as("s")).distinct()
      .as[String].collect().sorted.toIndexedSeq
    val symbols = scala.collection.mutable.Set[String](alphabet: _*)
    val merges = scala.collection.mutable.ListBuffer[(String, String, Long)]()
    var iterations = 0
    var done = false
    var fetch = math.min(maxBatch, maxBatchCap)
    while (merges.size < numMerges && !done) {
      val top = symPairCounts(segs)
        .filter(col("pair_count") >= minPairCount)
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(fetch).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      iterations += 1
      if (top.isEmpty) done = true
      else {
        val (safe, windowLimited) = selectMergeBatchEx(top, symbols.toSet,
          exhaustive = top.size < fetch)
        // empty safe batch (count ties / interaction at the very top) →
        // the single argmax, which is the sequential step itself
        val batch = (if (safe.isEmpty) top.take(1) else safe)
          .take(numMerges - merges.size)
        // adapt the fetch window (see Scaladoc): double when the window —
        // not a violation — limited the batch; decay toward maxBatch when
        // violations keep batches small relative to what we fetch. maxBatch
        // = 1 is the explicit classic-loop mode: never adapt.
        if (sys.env.contains("SPARK_GRAFT_BPE_DEBUG"))
          Console.err.println(s"[bpe] iter=$iterations fetch=$fetch " +
            s"top=${top.size} safe=${safe.size} batch=${batch.size} " +
            s"windowLimited=$windowLimited")
        if (maxBatch > 1) {
          if (windowLimited) fetch = math.min(fetch * 2, maxBatchCap)
          else if (batch.size * 8 < fetch)
            fetch = math.max(fetch / 2, math.min(maxBatch, maxBatchCap))
        }
        merges ++= batch
        symbols ++= batch.map(m => m._1 + m._2)
        segs = segs.withColumn("syms",
          applyMergeBatchCol(col("syms"), batch.map(m => (m._1, m._2))))
        if (iterations % checkpointEvery == 0) segs = segs.localCheckpoint(true)
      }
    }
    val vocabSyms = (alphabet ++ merges.map(m => m._1 + m._2)).distinct
    val vocab = vocabSyms.zipWithIndex
      .map { case (s, i) => (s, i + 1) }.toDF("symbol", "token_id")
    BpeModel(merges.toList, segs.localCheckpoint(true)
      .select(col("word"), col("syms")), vocab, eow, iterations)
  }

  /** Driver-local BPE training over the DISTRIBUTED word-frequency table —
    * the production-vocab scale path. One corpus-wide aggregation builds
    * the distinct-word table (the same [[initialSegs]] pass [[bpeTrain]]
    * makes); it is then COLLECTED (vocabulary-shaped: 10⁵-10⁸ rows
    * regardless of corpus bytes — `maxWords` guards the driver heap, and
    * overflow falls back cleanly to the distributed trainer) and the merge
    * loop runs entirely driver-side with the classic incremental
    * structures: pair→count map, pair→words inverted index, and a
    * lazy-deletion priority queue (stale heap entries are discarded when
    * their snapshot count no longer matches the live count). Each merge
    * touches only the words that contain the pair, so a 32k-merge vocab is
    * seconds of driver CPU and a FIXED number of Spark jobs (word-table
    * count + collect) — vs O(merges/batch) sequential jobs for
    * [[bpeTrain]], whose batches are violation-bound (~4-5×) on natural
    * corpora. The model is byte-identical to [[bpeTrain]]'s and the
    * classic reference's (same greedy fold, same count-desc/left/right
    * tiebreak; parity-spec'd).
    *
    * Use [[bpeTrain]] only when the distinct-word table itself outgrows
    * the driver (beyond ~10⁸ words at default heap sizes).
    */
  def bpeTrainLocal(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, eow: String = "</w>",
      maxWords: Long = 20000000L): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val segsDf = initialSegs(docs, textCol, eow)
    val nWords = segsDf.count()
    require(nWords <= maxWords,
      s"distinct-word table ($nWords rows) exceeds maxWords=$maxWords — " +
        "use the distributed bpeTrain for corpora whose vocabulary " +
        "outgrows the driver")
    val rows = segsDf.select("word", "wc", "syms")
      .as[(String, Long, Seq[String])].collect()
    val words = rows.map(_._1)
    val wc = rows.map(_._2)
    val segs: Array[Vector[String]] = rows.map(_._3.toVector)
    val alphabet = segs.iterator.flatten.toSet.toIndexedSeq.sorted

    import scala.collection.mutable
    def pairsOf(s: Vector[String]): Iterator[(String, String)] =
      s.iterator.zip(s.iterator.drop(1))
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → word indices that (at some point) contained it. Growable int
    // buffers, NOT BitSets — a sparse pair in a high-indexed word must not
    // allocate an index-range-sized bitmap. Members are deduped per word
    // at insert; stale members (a later merge consumed the occurrence)
    // fold to themselves below and are skipped.
    val index = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    val seenPairs = mutable.HashSet.empty[(String, String)]
    def addPairs(s: Vector[String], w: Int): Unit = {
      seenPairs.clear()
      pairsOf(s).foreach { p =>
        counts.update(p, counts.getOrElse(p, 0L) + wc(w))
        if (seenPairs.add(p))
          index.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += w
      }
    }
    var i = 0
    while (i < segs.length) { addPairs(segs(i), i); i += 1 }
    // max-heap: count desc, then left asc, then right asc (the classic
    // tiebreak — identical to bpeTrain's orderBy and the spec's refBpe)
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2)
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    counts.foreach { case ((l, r), c) =>
      if (c >= minPairCount) heap.enqueue((c, l, r)) }

    val merges = mutable.ListBuffer.empty[(String, String, Long)]
    while (merges.size < numMerges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      // lazy deletion: act only on entries whose snapshot is still live
      if (c >= minPairCount && counts.get((l, r)).contains(c)) {
        merges += ((l, r, c))
        val touched = mutable.HashSet.empty[(String, String)]
        // snapshot: the addPairs below mutates index buffers we read
        val members = index((l, r)).toArray
        var k = 0
        while (k < members.length) {
          val w = members(k)
          val old = segs(w)
          val neu = foldMergeLocal(old, l, r)
          // stale/duplicate membership (an earlier merge consumed this
          // word's occurrences) folds to itself — skip
          if (neu != old) {
            pairsOf(old).foreach { p =>
              val left = counts(p) - wc(w)
              if (left == 0L) { counts.remove(p); touched -= p }
              else { counts.update(p, left); touched += p }
            }
            seenPairs.clear()
            pairsOf(neu).foreach { p =>
              counts.update(p, counts.getOrElse(p, 0L) + wc(w))
              if (seenPairs.add(p))
                index.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += w
              touched += p
            }
            segs(w) = neu
          }
          k += 1
        }
        counts.remove((l, r))
        index.remove((l, r))
        touched -= ((l, r))
        touched.foreach { p =>
          val pc = counts.getOrElse(p, 0L)
          if (pc >= minPairCount) heap.enqueue((pc, p._1, p._2))
        }
      }
    }

    val vocabSyms = (alphabet ++ merges.map(m => m._1 + m._2)).distinct
    val vocab = vocabSyms.zipWithIndex
      .map { case (s, idx) => (s, idx + 1) }.toDF("symbol", "token_id")
    val segments = words.zip(segs).toSeq.toDF("word", "syms")
    BpeModel(merges.toList, segments, vocab, eow, trainIterations = 0)
  }

  /** Encode documents with a trained [[BpeModel]]: words seen in training
    * resolve through the memoized `segments` join (no merge replay — the
    * common case covers the entire training corpus by construction);
    * unseen words — the delta-ingest tail — replay the merge sequence in
    * rank order through a typed per-word kernel (sequential replay is
    * exactly equivalent to rank-priority application: a merge's components
    * can only be produced by strictly lower-rank merges, so by induction
    * processing ranks in order leaves no earlier-rank pair behind). The
    * kernel is the justified-last-resort typed map of this repo: an
    * unbounded iterative per-word loop no builtin expresses — and it runs
    * on the DISTINCT unseen-word table only, never the corpus.
    * Symbols map to ids via the broadcast (alphabet+numMerges)-row vocab;
    * unknown symbols (impossible for text whose charset appeared in
    * training) fall back to `unkId`.
    * Output: (idCol, token_ids: array<int>).
    */
  def bpeEncode(docs: DataFrame, textCol: String, idCol: String,
      model: BpeModel, unkId: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol),
      posexplode(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
        .as(Seq("__pos", "__word")))
    val mergePairs = model.merges.map(m => (m._1, m._2))
    val eow = model.eow
    val newSegs = toks.select(col("__word").as("word")).distinct()
      .join(model.segments.select("word"), Seq("word"), "left_anti")
      .as[String].map { w =>
        var s = w.split("").filter(_.nonEmpty).toVector :+ eow
        mergePairs.foreach { case (l, r) => s = foldMergeLocal(s, l, r) }
        (w, s)
      }.toDF("word", "syms")
    val allSegs = model.segments.select("word", "syms").unionByName(newSegs)
    toks
      .join(allSegs, col("__word") === col("word"))
      .select(col(idCol), col("__pos"),
        posexplode(col("syms")).as(Seq("__sp", "__sym")))
      .join(broadcast(model.vocab), col("__sym") === col("symbol"), "left")
      .withColumn("__tid", coalesce(col("token_id"), lit(unkId)))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("__pos"), col("__sp"), col("__tid")))).as("__o"))
      .select(col(idCol),
        transform(col("__o"), x => x.getField("__tid")).as("token_ids"))
  }
}

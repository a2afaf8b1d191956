package graft.seen

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Serializable cuckoo filter over strings (URL keys): 4-way buckets,
  * 16-bit fingerprints, partial-key cuckoo hashing (Fan et al., "Cuckoo
  * Filter: Practically Better Than Bloom", CoNEXT'14).
  *
  * Role (north_rule): the per-partition *exact-ish* in-round URL-seen
  * structure complementing the broadcast Bloom pre-filter. The reference's
  * analog is an in-memory Python set (/root/reference/src/handler.py:29-30,
  * /root/reference/src/processor.py:254) which cannot scale to 10^10 keys;
  * a cuckoo filter gives ~18 bits/key with deletion support (needed when a
  * fetch fails and the URL must be re-admitted for retry).
  *
  * No false negatives; false-positive rate ≈ 2*4/2^16 ≈ 1.2e-4 at full
  * load. Insert fails (returns false) when the kick loop exceeds
  * MaxKicks — callers must then fall back to the exact seen table
  * (SURVEY.md §7 "cap per-partition filter capacity, spill to exact").
  */
final class CuckooFilter private (
    val numBuckets: Int, // power of two
    val table: Array[Char], // numBuckets * 4 fingerprint slots; 0 = empty
    private var count: Long,
    // overflow stash: (bucket, fp) pairs whose kick loop failed — keeps the
    // no-false-negative guarantee even past capacity (checked on lookup)
    private val stash: scala.collection.mutable.ArrayBuffer[(Int, Char)] =
      scala.collection.mutable.ArrayBuffer.empty) extends Serializable {

  import CuckooFilter._

  def size: Long = count
  def capacity: Long = numBuckets.toLong * SlotsPerBucket
  /** Overflow-stash occupancy — a health metric: non-trivial stash size at
    * sub-capacity load means the caller is feeding correlated hash bits
    * (see SeenSet.bucketOf) and probe cost is degrading toward O(stash).
    */
  def stashSize: Int = stash.length

  private def slotBase(bucket: Int) = bucket * SlotsPerBucket

  private def bucketInsert(bucket: Int, fp: Char): Boolean = {
    val base = slotBase(bucket)
    var i = 0
    while (i < SlotsPerBucket) {
      if (table(base + i) == EmptyFp) { table(base + i) = fp; return true }
      i += 1
    }
    false
  }

  private def bucketContains(bucket: Int, fp: Char): Boolean = {
    val base = slotBase(bucket)
    table(base) == fp || table(base + 1) == fp ||
    table(base + 2) == fp || table(base + 3) == fp
  }

  private def bucketRemove(bucket: Int, fp: Char): Boolean = {
    val base = slotBase(bucket)
    var i = 0
    while (i < SlotsPerBucket) {
      if (table(base + i) == fp) { table(base + i) = EmptyFp; return true }
      i += 1
    }
    false
  }

  def insert(key: String): Boolean = insertHash(hash64(key))

  def insertHash(h: Long): Boolean =
    insertPair(bucketIndex(h, numBuckets), fingerprint(h), h)

  /** Shared insert with the full kick loop — used by both single-key insert
    * and mergeFrom (a merge without kicking overflows to the stash at
    * moderate load, defeating the capacity design exactly when the
    * distributed aggregation path merges per-task partials). `i1` must be
    * one of fp's two legal buckets; the kick chain preserves that invariant
    * for every displaced fingerprint, so stash entries stay probeable.
    */
  private def insertPair(i1: Int, fp: Char, seed: Long): Boolean = {
    if (bucketInsert(i1, fp)) { count += 1; return true }
    val i2 = altIndex(i1, fp, numBuckets)
    if (bucketInsert(i2, fp)) { count += 1; return true }
    // kick loop
    var idx = if ((seed & 1L) == 0L) i1 else i2
    var f = fp
    var kicks = 0
    val rnd = new java.util.Random(seed)
    while (kicks < MaxKicks) {
      val base = slotBase(idx)
      val victim = base + rnd.nextInt(SlotsPerBucket)
      val evicted = table(victim)
      table(victim) = f
      f = evicted
      idx = altIndex(idx, f, numBuckets)
      if (bucketInsert(idx, f)) { count += 1; return true }
      kicks += 1
    }
    // over capacity: stash the displaced fingerprint so lookups stay
    // correct, and signal the caller to spill to the exact seen table
    stash += ((idx, f))
    count += 1
    false
  }

  def mightContain(key: String): Boolean = mightContainHash(hash64(key))

  def mightContainHash(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = bucketIndex(h, numBuckets)
    if (bucketContains(i1, fp)) return true
    if (bucketContains(altIndex(i1, fp, numBuckets), fp)) return true
    stash.exists { case (b, f) =>
      f == fp && (b == i1 || b == altIndex(i1, fp, numBuckets))
    }
  }

  /** Delete one copy; true when a matching fingerprint was removed. Also
    * checks the overflow stash — a key whose fingerprint was displaced
    * there past capacity must still be deletable (retry re-admission is
    * the whole reason deletion exists), else it is "seen" forever and
    * `count` desynchronizes.
    */
  def remove(key: String): Boolean = {
    val h = hash64(key)
    val fp = fingerprint(h)
    val i1 = bucketIndex(h, numBuckets)
    if (bucketRemove(i1, fp)) { count -= 1; true }
    else if (bucketRemove(altIndex(i1, fp, numBuckets), fp)) { count -= 1; true }
    else {
      val i2 = altIndex(i1, fp, numBuckets)
      val at = stash.indexWhere { case (b, f) => f == fp && (b == i1 || b == i2) }
      if (at >= 0) { stash.remove(at); count -= 1; true }
      else false
    }
  }

  /** Merge another filter of the same size (used by the Spark Aggregator);
    * returns false if any insert failed (over capacity).
    */
  def mergeFrom(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets, "cuckoo merge: size mismatch")
    var ok = true
    other.stash.foreach { case (b, f) =>
      ok &= insertPair(b, f, (b.toLong << 16) | f.toLong)
    }
    var b = 0
    while (b < other.numBuckets) {
      val base = b * SlotsPerBucket
      var i = 0
      while (i < SlotsPerBucket) {
        val fp = other.table(base + i)
        if (fp != EmptyFp) {
          // re-insert by reconstructing one of its two buckets: the stored
          // bucket IS one of them; altIndex is an involution, so inserting
          // at (b, fp) — with the full kick loop — preserves lookup
          // correctness and keeps merge from stashing below capacity.
          ok &= insertPair(b, fp, (b.toLong << 16) | fp.toLong)
        }
        i += 1
      }
      b += 1
    }
    ok
  }

  def serialize(): Array[Byte] = {
    // size the buffer in LONG arithmetic: at the maximum create() allows
    // (2^28 buckets → 2^30 slots) table.length * 2 overflows Int and
    // ByteBuffer.allocate(negative) throws an unnamed error mid-job. A
    // filter that genuinely cannot fit one JVM array gets a named error
    // telling the operator which knob to turn.
    val size = 4L + 8L + 4L + table.length.toLong * 2L + stash.length.toLong * 6L
    require(size <= Int.MaxValue,
      s"cuckoo filter too large to serialize ($size bytes) — raise the " +
        "bucket count (cuckooSeenBuckets) so each bucket's filter shrinks")
    val buf = ByteBuffer.allocate(size.toInt)
    buf.putInt(numBuckets)
    buf.putLong(count)
    buf.putInt(stash.length)
    var i = 0
    while (i < table.length) { buf.putChar(table(i)); i += 1 }
    stash.foreach { case (b, f) => buf.putInt(b); buf.putChar(f) }
    buf.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  val EmptyFp: Char = 0

  /** Sized for expectedItems at ~84% load (white-paper safe load ~95% for
    * 4-way; headroom keeps kick loops short).
    */
  def create(expectedItems: Long): CuckooFilter = {
    val needed = math.max(8L, (expectedItems / (SlotsPerBucket * 0.84)).toLong + 1)
    var nb = 8
    while (nb < needed && nb < (1 << 28)) nb <<= 1
    new CuckooFilter(nb, new Array[Char](nb * SlotsPerBucket), 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val buf = ByteBuffer.wrap(bytes)
    val nb = buf.getInt
    val count = buf.getLong
    val nStash = buf.getInt
    val table = new Array[Char](nb * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = buf.getChar; i += 1 }
    val stash = scala.collection.mutable.ArrayBuffer.empty[(Int, Char)]
    var j = 0
    while (j < nStash) { stash += ((buf.getInt, buf.getChar)); j += 1 }
    new CuckooFilter(nb, table, count, stash)
  }

  /** 64-bit FNV-1a then avalanche (splitmix64 finalizer) — stable across
    * JVMs (no String.hashCode dependence).
    */
  def hash64(key: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = key.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fingerprint in [1, 65535] (0 reserved for empty). */
  def fingerprint(h: Long): Char = {
    val fp = ((h >>> 48) & 0xffff).toInt
    (if (fp == 0) 1 else fp).toChar
  }

  def bucketIndex(h: Long, numBuckets: Int): Int =
    (h & (numBuckets - 1)).toInt

  /** Partial-key alt index: i XOR hash(fp) — an involution, so
    * altIndex(altIndex(i)) == i.
    */
  def altIndex(i: Int, fp: Char, numBuckets: Int): Int =
    (i ^ (mix(fp.toLong) & (numBuckets - 1))).toInt & (numBuckets - 1)
}

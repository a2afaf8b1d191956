package graft.ops

/** Primitive-typed signature kernels for the dedup/ANN operators.
  *
  * These run inside typed Dataset.map/flatMap: per-row signature math in
  * tight JVM loops instead of nested Catalyst higher-order lambdas (which
  * execute interpreted, not codegen'd — measured 40-70x slower at sf0.1).
  * The surrounding joins/aggregations stay declarative DataFrames, so the
  * scale-out structure (band-keyed shuffles, AQE) is unchanged.
  */
object Sketches extends Serializable {

  /** splitmix64 avalanche. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-16 chars (fast; no byte conversion). */
  @inline def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  /** Lowercased \W+ word tokens. The Pattern is compiled once —
    * `String.split` with a multi-char regex recompiles it per call, a
    * per-document cost on every shingle/simhash/jaccard path
    * (`Pattern.split` is the method String.split delegates to, so the
    * token stream is unchanged).
    */
  private val TokenPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")
  def tokenize(text: String): Array[String] =
    TokenPattern.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)

  /** Distinct word k-shingles. */
  def shingles(text: String, k: Int): Array[String] = {
    val w = tokenize(text)
    if (w.length < k) {
      if (w.isEmpty) Array.empty else Array(w.mkString(" "))
    } else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + k <= w.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
      out.toArray
    }
  }

  /** MinHash signature via double hashing: sig_i = min over shingles of
    * (h1 + (i+1)*h2) — the standard Carter-Wegman family.
    */
  def minhashSignature(sh: Array[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val h = hashString(sh(s))
      val h1 = h
      val h2 = mix(h) | 1L
      var i = 0
      while (i < numHashes) {
        val v = h1 + (i + 1) * h2
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Band hashes over the signature: bands of rowsPerBand values. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rowsPerBand = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rowsPerBand) {
        h ^= sig(b * rowsPerBand + r)
        h *= 0x100000001b3L
        r += 1
      }
      out(b) = mix(h)
      b += 1
    }
    out
  }

  /** 64-bit SimHash over word tokens. */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = tokenize(text)
    var t = 0
    while (t < toks.length) {
      val h = hashString(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Deterministic random hyperplanes for cosine LSH:
    * planes(table)(bit)(dim) in [-1, 1), derived from the seed — tiny
    * (tables×bits×dim doubles), broadcast to executors.
    *
    * ENGINE-PORTABLE derivation (the mix_sample_split md5-unit-draw
    * pattern): coefficient = first 48 bits of md5("seed-t-b-d") / 2^47 - 1.
    * A 48-bit integer is exactly representable as a double and the divisor
    * is a power of two, so the coefficient — and therefore every signature
    * dot product (sequential double accumulation, verified bit-identical
    * to DuckDB's list_dot_product) — reproduces bit-exactly in any engine
    * with md5 + IEEE doubles, which is what makes ann_lsh_pairs
    * DuckDB-oracle-able rather than adjudicated no-oracle.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (t, b, d) =>
      md.reset()
      val hex = md.digest(s"$seed-$t-$b-$d".getBytes("UTF-8"))
        .take(6).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 140737488355328.0 - 1.0
    }
  }

  /** Signature of a vector under one table's hyperplanes. */
  def rhpSignature(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var d = 0
      val n = math.min(v.length, p.length)
      while (d < n) { dot += v(d) * p(d); d += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

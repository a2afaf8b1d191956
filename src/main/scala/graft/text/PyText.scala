package graft.text

/** Python string/regex semantics needed for byte-identical extraction.
  *
  * The reference normalizes extracted text with CPython `str.strip()`,
  * `str.replace`, `re.sub(r"\s+", " ", v)` and filters metadata chars with
  * `str.isdigit()` (see /root/reference/src/parser.py:56,84-89,286,340).
  * Java's default `\s` is ASCII-only and `Character.isWhitespace` differs
  * from CPython (NBSP U+00A0 is Python-whitespace but not Java-whitespace;
  * ZWNJ U+200C is whitespace in neither and must survive). These helpers
  * reproduce the CPython definitions exactly so the composition of
  * strip/replace/collapse is byte-identical.
  */
object PyText {

  /** CPython `str.isspace()` / `re \s` (unicode): true for category
    * Zs/Zl/Zp plus the bidi-class B/S/WS control chars
    * (\t \n \v \f \r FS GS RS US NEL).
    */
  def isPySpace(c: Char): Boolean =
    if (c < 0x80) // ASCII: ' ', \t \n \v \f \r, FS GS RS US
      c == ' ' || (c >= '\t' && c <= '\r') || (c >= '\u001c' && c <= '\u001f')
    else if (c == '\u0085' || c == '\u00a0') true // NEL, NBSP
    else if (c < 0x1680) false // no Zs/Zl/Zp in (U+00A0, U+1680): this arm
    // makes the per-char scan of Persian text (U+0600-06FF) branch-cheap
    // instead of a Character.getType table lookup per char
    else {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR
    }

  /** CPython `str.strip()` with no args (strips isPySpace chars). */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** CPython `re.sub(r"\s+", " ", s)` on a unicode string. Fast path:
    * strings already in collapsed form (only single ' ' runs) are returned
    * as-is — no copy; the extract stage calls this on every field and is
    * allocation-bandwidth-bound at scale.
    */
  def collapseWhitespace(s: String): String = {
    val n = s.length
    var j = 0
    var prevSpace = false
    var needsWork = false
    while (j < n && !needsWork) {
      val c = s.charAt(j)
      if (c == ' ') { if (prevSpace) needsWork = true; prevSpace = true }
      else if (isPySpace(c)) needsWork = true
      else prevSpace = false
      j += 1
    }
    if (!needsWork) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isPySpace(c)) {
        sb.append(' ')
        i += 1
        while (i < n && isPySpace(s.charAt(i))) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** CPython `str.isdigit()` for a single char: Unicode Numeric_Type Digit
    * or Decimal. Covers ASCII 0-9, Persian ۰-۹ (U+06F0-06F9), Arabic-Indic
    * ٠-٩ (U+0660-0669), superscripts, subscripts, circled digits, etc.
    *
    * Java has no Numeric_Type accessor, so the Digit extras are derived:
    * category No (other number) WITH an integral numeric value 0-9 —
    * fractions report getNumericValue = -2 and are correctly excluded,
    * letterlike numerics (Nl, e.g. Roman numerals, 〇) are excluded as
    * CPython does. A hand-rolled range list here previously admitted
    * U+2071 'ⁱ' (a LETTER inside the superscript block) and missed the
    * subscript/dingbat digits CPython accepts — byte divergence in
    * cleanMetadataField vs parser.py.
    */
  def isPyDigit(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.DECIMAL_DIGIT_NUMBER || {
      t == Character.OTHER_NUMBER && {
        val v = Character.getNumericValue(c)
        v >= 0 && v <= 9
      }
    }
  }

  /** CPython `int(str)` for strings of unicode decimal digits with optional
    * ASCII sign; throws NumberFormatException like `int()` raises ValueError
    * when not parseable. Only Nd digits carry a decimal value (matching
    * CPython: `int("۱۴۰۳")` == 1403 but `int("²")` raises).
    */
  def pyInt(sRaw: String): Int = {
    val v = pyLong(sRaw)
    if (v > Int.MaxValue || v < Int.MinValue)
      throw new NumberFormatException(s"overflow: '$sRaw'")
    v.toInt
  }

  /** CPython `int(str)` up to Long range — int() itself is
    * arbitrary-precision, so callers that must mirror its behavior on huge
    * inputs (e.g. a 10-digit Shamsi "year") parse through this instead of
    * [[pyInt]]; values past ~19 digits still throw (documented bound).
    */
  def pyLong(sRaw: String): Long = {
    val s = pyStrip(sRaw)
    if (s.isEmpty) throw new NumberFormatException(s"invalid int: '$sRaw'")
    var i = 0
    var sign = 1L
    if (s.charAt(0) == '-') { sign = -1L; i = 1 }
    else if (s.charAt(0) == '+') i = 1
    if (i >= s.length) throw new NumberFormatException(s"invalid int: '$sRaw'")
    var acc = 0L
    while (i < s.length) {
      val d = Character.digit(s.charAt(i), 10)
      if (d < 0 || Character.getType(s.charAt(i)) != Character.DECIMAL_DIGIT_NUMBER)
        throw new NumberFormatException(s"invalid int: '$sRaw'")
      if (acc > (Long.MaxValue - d) / 10)
        throw new NumberFormatException(s"overflow: '$sRaw'")
      acc = acc * 10 + d
      i += 1
    }
    sign * acc
  }

  /** One unicode decimal digit (Nd) — CPython `re \d` semantics. */
  def isPyDecimal(c: Char): Boolean =
    Character.getType(c) == Character.DECIMAL_DIGIT_NUMBER

  /** The answer-label phrase replaced by the reference's content validator
    * (/root/reference/src/parser.py:84).
    */
  val AnswerLabel = "نظریه مشورتی اداره کل حقوقی قوه قضاییه :"

  /** `ParsedContent.remove_newlines` validator, byte-for-byte
    * (/root/reference/src/parser.py:69-89): hazm Normalizer is stubbed to
    * identity at parser.py:12 (so NO unicode normalization), then the
    * answer-label is replaced with "\n\n" (parser.py:84) which the
    * subsequent `re.sub(r"\s+", " ")` + `strip()` composition collapses —
    * net effect: label → single space (or removed at string edges).
    */
  def normalizeField(v: String): String = {
    if (v == null) return ""
    val n = v.length
    val label = AnswerLabel
    val L = label.length
    val l0 = label.charAt(0)
    // detection pass — the composition strip(collapse(replace(label,"\n\n")))
    // is identity iff: no label occurrence, no edge whitespace, no
    // whitespace char other than ' ', no "  " run. One scan, no copy; this
    // runs on every extracted field and the hot content strings are KBs of
    // Persian text, so the naive 3-copy composition is the extract stage's
    // dominant allocation
    var clean = true
    var prevSpace = false
    var i = 0
    while (clean && i < n) {
      val c = v.charAt(i)
      if (c == ' ') { if (prevSpace || i == 0 || i == n - 1) clean = false; prevSpace = true }
      else if (isPySpace(c)) clean = false
      else {
        if (c == l0 && i + L <= n && v.regionMatches(i, label, 0, L)) clean = false
        prevSpace = false
      }
      i += 1
    }
    if (clean) return v
    // build pass — a label occurrence behaves as a whitespace run member
    // (replace→"\n\n" then \s+→' ' then strip), merged left-to-right
    // non-overlapping exactly like String.replace
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    i = 0
    while (i < n) {
      val c = v.charAt(i)
      if (c == l0 && i + L <= n && v.regionMatches(i, label, 0, L)) {
        pendingSpace = true; i += L
      } else if (isPySpace(c)) {
        pendingSpace = true; i += 1
      } else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        sb.append(c); pendingSpace = false; i += 1
      }
    }
    sb.toString
  }

  /** Metadata char filter (/root/reference/src/parser.py:56,286):
    * `''.join(c for c in v if c.isdigit() or c in '-/کط')`, default
    * "نامشخص" when empty.
    */
  def cleanMetadataField(v: String): String = {
    if (v == null) return "نامشخص"
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (isPyDigit(c) || c == '-' || c == '/' || c == 'ک' || c == 'ط') sb.append(c)
      i += 1
    }
    if (sb.length == 0) "نامشخص" else sb.toString
  }
}

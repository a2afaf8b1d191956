package graft.text

/** Jalali (Shamsi) calendar arithmetic and the reference's date pipeline.
  *
  * The reference validates Shamsi dates with `jdatetime.date(y, m, d)` and
  * converts with `.togregorian()` (/root/reference/src/parser.py:92-155).
  * Spark has no Jalali chronology, so this is a from-scratch transliteration
  * of the public jdatetime algorithm (the 33-year-cycle arithmetic of
  * jdatetime/jalali.py `JalaliToGregorian`), property-tested against known
  * date pairs in JalaliDateSpec.
  */
object JalaliDate {
  val MinYear = 1
  val MaxYear = 9377
  // months 1-6: 31 days, 7-11: 30 days, 12: 29 (30 in leap years)
  private val daysInMonth = Array(31, 31, 31, 31, 31, 31, 30, 30, 30, 30, 30, 29)

  /** jdatetime's leap-year rule (33-year cycle). */
  def isLeap(year: Int): Boolean = {
    val m = year % 33
    m == 1 || m == 5 || m == 9 || m == 13 || m == 17 || m == 22 || m == 26 || m == 30
  }

  /** `jdatetime.date(y, m, d)` constructor validation. */
  def isValid(year: Int, month: Int, day: Int): Boolean = {
    if (year < MinYear || year > MaxYear) return false
    if (month < 1 || month > 12) return false
    if (day < 1) return false
    if (month == 12 && day == 30 && isLeap(year)) return true
    day <= daysInMonth(month - 1)
  }

  /** Jalali → Gregorian (y, m, d). Transliterates the 33-year-cycle
    * day-count arithmetic jdatetime uses (the public jdf.scr.ir algorithm);
    * its implied leap set is exactly the `isLeap` %33 rule, so validation
    * and conversion are mutually consistent (asserted by the continuity
    * property test). Caller must have validated the input.
    */
  def toGregorian(jyIn: Int, jm: Int, jd: Int): (Int, Int, Int) = {
    val jy = jyIn + 1595
    var days = -355668 + 365 * jy + (jy / 33) * 8 + ((jy % 33) + 3) / 4 + jd +
      (if (jm < 7) (jm - 1) * 31 else (jm - 7) * 30 + 186)
    var gy = 400 * (days / 146097)
    days %= 146097
    if (days > 36524) {
      days -= 1
      gy += 100 * (days / 36524)
      days %= 36524
      if (days >= 365) days += 1
    }
    gy += 4 * (days / 1461)
    days %= 1461
    if (days > 365) {
      gy += (days - 1) / 365
      days = (days - 1) % 365
    }
    var gd = days + 1
    val gLeap = (gy % 4 == 0 && gy % 100 != 0) || gy % 400 == 0
    val gMonths = Array(31, if (gLeap) 29 else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    var gm = 0
    while (gm < 12 && gd > gMonths(gm)) { gd -= gMonths(gm); gm += 1 }
    (gy, gm + 1, gd)
  }

  /** Gregorian → Jalali, derived as the exact inverse of `toGregorian`
    * (via epoch-day arithmetic) so the pair is consistent by construction.
    * Only used for property tests and enrichment ops — the reference only
    * ever converts Jalali → Gregorian (parser.py:144-146).
    */
  def fromGregorian(gy: Int, gm: Int, gd: Int): (Int, Int, Int) = {
    val target = java.time.LocalDate.of(gy, gm, gd).toEpochDay
    var jy = gy - 621
    var startEpoch = epochDayOfJalaliNewYear(jy)
    while (startEpoch > target) { jy -= 1; startEpoch = epochDayOfJalaliNewYear(jy) }
    while (epochDayOfJalaliNewYear(jy + 1) <= target) { jy += 1; startEpoch = epochDayOfJalaliNewYear(jy) }
    val doy = (target - startEpoch).toInt // 0-based day of jalali year
    if (doy < 186) (jy, 1 + doy / 31, 1 + doy % 31)
    else (jy, 7 + (doy - 186) / 30, 1 + (doy - 186) % 30)
  }

  private def epochDayOfJalaliNewYear(jy: Int): Long = {
    val (gy, gm, gd) = toGregorian(jy, 1, 1)
    java.time.LocalDate.of(gy, gm, gd).toEpochDay
  }

  private val Default = ("0001/01/01", "0001/01/01")
  private val degenerate =
    Set("0000/00/00", "0/0/0", "00/00/00", "0", "00", "", " ")

  /** `DateHandler.process_date` (/root/reference/src/parser.py:104-155),
    * byte-for-byte: separator normalize, non-digit strip (unicode digits
    * survive, so Persian digit dates parse), degenerate-literal check,
    * 3-part split, CPython int() parse, 2-digit year +1400, jdatetime
    * validation (invalid → formatted shamsi + default gregorian), convert.
    * Returns (shamsi, gregorian).
    */
  def processDate(value: String): (String, String) = {
    if (value == null) return Default
    // re.sub(r'[/\-]', '/', value.strip())
    val stripped = PyText.pyStrip(value)
    val sb = new java.lang.StringBuilder(stripped.length)
    var i = 0
    while (i < stripped.length) {
      val c = stripped.charAt(i)
      if (c == '/' || c == '\\' || c == '-') sb.append('/')
      else if (PyText.isPyDecimal(c)) sb.append(c) // re.sub(r'[^\d/]','') keeps \d only
      i += 1
    }
    val normalized = sb.toString
    if (degenerate.contains(normalized)) return Default
    // CPython str.split('/') keeps empty strings
    val parts = normalized.split("/", -1)
    if (parts.length != 3) return Default
    // CPython int() is arbitrary-precision: a 10-digit "year" still formats
    // into the shamsi string (validation then fails → default gregorian),
    // so components parse as Long — an Int-bounded parse returned full
    // Default and dropped the shamsi the reference preserves
    var year, month, day = 0L
    try {
      year = PyText.pyLong(parts(0))
      month = PyText.pyLong(parts(1))
      day = PyText.pyLong(parts(2))
    } catch { case _: NumberFormatException => return Default }
    if (year < 100) year += 1400
    val shamsi = fmtYmd(year, month, day)
    val intRange = year <= Int.MaxValue && month <= Int.MaxValue && day <= Int.MaxValue
    if (!intRange || !isValid(year.toInt, month.toInt, day.toInt))
      return (shamsi, "0001/01/01")
    val (gy, gmn, gdy) = toGregorian(year.toInt, month.toInt, day.toInt)
    (shamsi, fmtYmd(gy, gmn, gdy))
  }

  /** "%04d/%02d/%02d" for non-negative components (all callers pass
    * digits-derived values) without a java.util.Formatter per row — the
    * interpolator pair was the hot term of processDate on a 10^4-row map.
    */
  private def fmtYmd(y: Long, m: Long, d: Long): String = {
    val sb = new java.lang.StringBuilder(10)
    def pad(v: Long, w: Int): Unit = {
      val s = java.lang.Long.toString(v)
      var i = s.length
      while (i < w) { sb.append('0'); i += 1 }
      sb.append(s)
    }
    pad(y, 4); sb.append('/'); pad(m, 2); sb.append('/'); pad(d, 2)
    sb.toString
  }

  /** The date-pattern search used before process_date
    * (/root/reference/src/parser.py:301): CPython
    * `re.search(r'(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})', text)` with unicode
    * \d. Returns the reassembled "y/m/d" group string, or None.
    */
  private val datePattern = java.util.regex.Pattern.compile(
    "(\\d{4})[/\\\\-](\\d{1,2})[/\\\\-](\\d{1,2})",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def searchDatePattern(text: String): Option[String] = {
    val m = datePattern.matcher(text)
    if (m.find()) Some(s"${m.group(1)}/${m.group(2)}/${m.group(3)}") else None
  }
}

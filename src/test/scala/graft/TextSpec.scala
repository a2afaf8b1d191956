package graft

import graft.text.{JalaliDate, PyText}
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("isPySpace matches CPython str.isspace set") {
    assert(PyText.isPySpace(' '))
    assert(PyText.isPySpace('\t'))
    assert(PyText.isPySpace('\n'))
    assert(PyText.isPySpace('\u00a0')) // NBSP — python whitespace, NOT java
    assert(PyText.isPySpace('\u2009')) // thin space (Zs)
    assert(PyText.isPySpace('\u2028')) // line separator (Zl)
    assert(PyText.isPySpace('\u001c')) // FS — python whitespace, not Unicode WS
    assert(PyText.isPySpace('\u0085')) // NEL
    assert(!PyText.isPySpace('\u200c')) // ZWNJ must survive
    assert(!PyText.isPySpace('\u200d')) // ZWJ
    assert(!PyText.isPySpace('a'))
    assert(!PyText.isPySpace('آ'))
  }

  test("pyStrip strips NBSP but keeps ZWNJ") {
    assert(PyText.pyStrip("\u00a0 سلام\u200c جهان \u00a0") == "سلام\u200c جهان")
  }

  test("collapseWhitespace = re.sub(r'\\s+',' ')") {
    assert(PyText.collapseWhitespace("a \t\n b  c") == "a b c")
    assert(PyText.collapseWhitespace("می\u200cشود") == "می\u200cشود") // ZWNJ kept
    assert(PyText.collapseWhitespace("  x   y ") == " x y ")
  }

  test("isPyDigit: ASCII, Persian, Arabic-Indic digits") {
    "0123456789۰۱۲۳۴۵۶۷۸۹٠١٢٣٤٥٦٧٨٩".foreach(c => assert(PyText.isPyDigit(c), c.toString))
    assert(!PyText.isPyDigit('-'))
    assert(!PyText.isPyDigit('ک'))
  }

  test("isPyDigit matches CPython str.isdigit on the tricky cases") {
    // verified against CPython 3.11: superscripts/subscripts/circled/
    // dingbat digits are True; 'ⁱ' (a letter inside the superscript
    // block), fractions, Roman numerals, 〇 are False
    "²³¹⁰⁴⁵⁶⁷⁸⁹₀₁₂₃₄₅₆₇₈₉①⑨❶➒⑴⒈".foreach(c =>
      assert(PyText.isPyDigit(c), s"expected isdigit: $c U+${c.toInt.toHexString}"))
    "ⁱ¼½¾ⅤⅩ〇十".foreach(c =>
      assert(!PyText.isPyDigit(c), s"expected NOT isdigit: $c U+${c.toInt.toHexString}"))
  }

  test("pyLong/processDate: huge components keep the formatted shamsi like CPython int()") {
    assert(PyText.pyLong("9999999999") == 9999999999L)
    assertThrows[NumberFormatException](PyText.pyInt("9999999999"))
    // reference: int('9999999999') succeeds, jdatetime validation fails →
    // (formatted shamsi, default gregorian) — an Int-bounded parse
    // returned full Default and lost the shamsi column
    assert(graft.text.JalaliDate.processDate("9999999999/01/01") ==
      ("9999999999/01/01", "0001/01/01"))
  }

  test("pyInt parses Persian digits like CPython int()") {
    assert(PyText.pyInt("۱۴۰۳") == 1403)
    assert(PyText.pyInt("0012") == 12)
    assert(PyText.pyInt(" 7 ") == 7)
    assertThrows[NumberFormatException](PyText.pyInt(""))
    assertThrows[NumberFormatException](PyText.pyInt("1a"))
  }

  test("normalizeField reproduces the validator composition (parser.py:69-89)") {
    // label → "\n\n" → collapsed to single space mid-string
    val label = PyText.AnswerLabel
    assert(PyText.normalizeField(s"پرسش${label}پاسخ") == "پرسش پاسخ")
    // label at edge → stripped entirely
    assert(PyText.normalizeField(s"$label جواب") == "جواب")
    assert(PyText.normalizeField("a\n\nb\t c") == "a b c")
    assert(PyText.normalizeField(null) == "")
  }

  test("cleanMetadataField keeps digits (any script) and -/کط") {
    assert(PyText.cleanMetadataField("شماره 123/45-ک") == "123/45-ک")
    assert(PyText.cleanMetadataField("۷/۱۴۰۲ ع") == "۷/۱۴۰۲")
    assert(PyText.cleanMetadataField("هیچ") == "نامشخص")
    assert(PyText.cleanMetadataField("") == "نامشخص")
  }

  // --- Jalali calendar ---

  test("known Jalali→Gregorian pairs") {
    assert(JalaliDate.toGregorian(1403, 1, 1) == ((2024, 3, 20)))
    assert(JalaliDate.toGregorian(1400, 1, 1) == ((2021, 3, 21)))
    assert(JalaliDate.toGregorian(1399, 12, 30) == ((2021, 3, 20))) // 1399 leap
    assert(JalaliDate.toGregorian(1398, 12, 29) == ((2020, 3, 19)))
    assert(JalaliDate.toGregorian(1402, 7, 1) == ((2023, 9, 23)))
    assert(JalaliDate.toGregorian(1370, 10, 14) == ((1992, 1, 4)))
    assert(JalaliDate.toGregorian(1375, 1, 1) == ((1996, 3, 20)))
  }

  test("leap years follow the 33-year cycle") {
    Seq(1399, 1403, 1408, 1412).foreach(y => assert(JalaliDate.isLeap(y), y.toString))
    Seq(1400, 1401, 1402, 1404).foreach(y => assert(!JalaliDate.isLeap(y), y.toString))
  }

  test("validation: month/day bounds incl. leap esfand") {
    assert(JalaliDate.isValid(1399, 12, 30))
    assert(!JalaliDate.isValid(1400, 12, 30))
    assert(JalaliDate.isValid(1400, 12, 29))
    assert(!JalaliDate.isValid(1400, 13, 1))
    assert(!JalaliDate.isValid(1400, 0, 1))
    assert(!JalaliDate.isValid(1400, 7, 31))
    assert(JalaliDate.isValid(1400, 6, 31))
    assert(!JalaliDate.isValid(0, 1, 1))
    assert(!JalaliDate.isValid(9378, 1, 1))
  }

  test("round-trip toGregorian∘fromGregorian = id over 1300-1450 exhaustively") {
    var y = 1300
    while (y <= 1450) {
      var m = 1
      while (m <= 12) {
        var d = 1
        while (d <= 31) {
          if (JalaliDate.isValid(y, m, d)) {
            val (gy, gm, gd) = JalaliDate.toGregorian(y, m, d)
            assert(JalaliDate.fromGregorian(gy, gm, gd) == ((y, m, d)), s"$y/$m/$d -> $gy/$gm/$gd")
          }
          d += 1
        }
        m += 1
      }
      y += 1
    }
  }

  test("continuity: consecutive valid Jalali dates map to consecutive days") {
    // ties isValid (month lengths + leap rule) to toGregorian: every valid
    // date's successor must be exactly one Gregorian day later
    var prev = java.time.LocalDate.of(1921, 1, 1).toEpochDay - 1
    var first = true
    for (y <- 1300 to 1420; m <- 1 to 12; d <- 1 to 31 if JalaliDate.isValid(y, m, d)) {
      val (gy, gm, gd) = JalaliDate.toGregorian(y, m, d)
      val epoch = java.time.LocalDate.of(gy, gm, gd).toEpochDay
      if (!first) assert(epoch == prev + 1, s"gap at $y/$m/$d -> $gy/$gm/$gd")
      prev = epoch
      first = false
    }
  }

  test("gregorian dates from toGregorian are valid calendar dates") {
    var y = 1300
    while (y <= 1450) {
      for (m <- 1 to 12; d <- Seq(1, 15, 29) if JalaliDate.isValid(y, m, d)) {
        val (gy, gm, gd) = JalaliDate.toGregorian(y, m, d)
        // must not throw
        java.time.LocalDate.of(gy, gm, gd)
      }
      y += 7
    }
  }

  test("processDate reproduces DateHandler.process_date (parser.py:104-155)") {
    assert(JalaliDate.processDate("1403/01/01") == (("1403/01/01", "2024/03/20")))
    assert(JalaliDate.processDate("1402-7-1") == (("1402/07/01", "2023/09/23")))
    assert(JalaliDate.processDate("1402\\7\\1") == (("1402/07/01", "2023/09/23")))
    // 2-digit year +1400
    assert(JalaliDate.processDate("03/01/01") == (("1403/01/01", "2024/03/20")))
    // invalid shamsi → formatted shamsi + default gregorian
    assert(JalaliDate.processDate("1400/12/30") == (("1400/12/30", "0001/01/01")))
    // degenerate inputs
    assert(JalaliDate.processDate("0000/00/00") == (("0001/01/01", "0001/01/01")))
    assert(JalaliDate.processDate("") == (("0001/01/01", "0001/01/01")))
    assert(JalaliDate.processDate("1402/07") == (("0001/01/01", "0001/01/01")))
    assert(JalaliDate.processDate(null) == (("0001/01/01", "0001/01/01")))
    // Persian digits parse like CPython int()
    assert(JalaliDate.processDate("۱۴۰۳/۰۱/۰۱") == (("1403/01/01", "2024/03/20")))
    // junk chars dropped by [^\d/] like the reference
    assert(JalaliDate.processDate("تاریخ 1403/1/1 هش") == (("1403/01/01", "2024/03/20")))
  }

  test("searchDatePattern mirrors re.search group extraction (parser.py:301)") {
    assert(JalaliDate.searchDatePattern("مورخ 1402/11/07 صادر") == Some("1402/11/07"))
    assert(JalaliDate.searchDatePattern("1402-1-7") == Some("1402/1/7"))
    assert(JalaliDate.searchDatePattern("۱۴۰۲/۱/۷") == Some("۱۴۰۲/۱/۷")) // unicode \d matches
    assert(JalaliDate.searchDatePattern("بدون تاریخ") == None)
    assert(JalaliDate.searchDatePattern("402/1/7") == None) // needs 4 digits
  }
}

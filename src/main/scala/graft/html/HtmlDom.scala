package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal hand-rolled HTML parser + document-order text extraction.
  *
  * No HTML parser jar exists in the sandbox (no jsoup; see build notes), so
  * this walker implements the subset of lxml's behavior the reference relies
  * on (/root/reference/src/parser.py:199,326-340): build an element tree,
  * resolve positional child paths, and `text_content()` = concatenation of
  * all descendant text nodes in document order (comments excluded,
  * script/style text included, entities decoded).
  *
  * Parsing is lenient (never throws on malformed markup) except for
  * documents with no element at all — lxml's `html.fromstring("")` raises,
  * which the reference maps to a full-sentinel ParsedContent
  * (parser.py:248-256); callers replicate that by checking for None root.
  */
object HtmlDom {

  sealed trait Node
  final case class Text(value: String) extends Node
  /** Zero-copy text node used by the streaming container parse: a span of
    * the ORIGINAL document string, decoded lazily during text walks.
    * `entityDecode` is true only when the span actually contains '&' (and
    * is never set for script/style raw text, which lxml leaves undecoded) —
    * so the common case appends straight from the source with no substring
    * or decode copy.
    */
  final class TextSpan(val doc: String, val start: Int, val end: Int,
      val entityDecode: Boolean) extends Node
  final class Element(val tag: String, val attrs: Map[String, String]) extends Node {
    val children: ArrayBuffer[Node] = new ArrayBuffer[Node]()

    def elementChildren(childTag: String): IndexedSeq[Element] =
      children.collect { case e: Element if e.tag == childTag => e }.toIndexedSeq

    private def appendTo(sb: java.lang.StringBuilder): Unit = {
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(v)
        case t: TextSpan =>
          if (t.entityDecode) sb.append(decodeEntities(t.doc.substring(t.start, t.end)))
          else sb.append(t.doc, t.start, t.end)
        case e: Element => e.children.foreach(walk)
      }
      walk(this)
    }

    /** lxml `text_content()`: all descendant text in document order. */
    def textContent: String = {
      val sb = new java.lang.StringBuilder
      appendTo(sb)
      sb.toString
    }

    /** `text_content().strip().replace('\n', ' ')` fused into one copy —
      * the extract stage's hottest allocation (the naive composition makes
      * three full copies of the content string per field). Replacing \n
      * before stripping is equivalent here: both '\n' and ' ' are
      * Python-whitespace, so the stripped edge set is identical either way.
      */
    def textContentCleaned: String = {
      val sb = new java.lang.StringBuilder
      appendTo(sb)
      var i = 0
      var j = sb.length
      while (i < j && graft.text.PyText.isPySpace(sb.charAt(i))) i += 1
      while (j > i && graft.text.PyText.isPySpace(sb.charAt(j - 1))) j -= 1
      val out = new Array[Char](j - i)
      sb.getChars(i, j, out, 0)
      var k = 0
      while (k < out.length) { if (out(k) == '\n') out(k) = ' '; k += 1 }
      new String(out)
    }

    /** Fused `textContentCleaned` + `PyText.normalizeField` + the
      * pre-normalization emptiness test, in two buffer passes instead of
      * four copies (walk → strip+\n-replace copy → String → normalize
      * copy). Returns (normalized, cleanedNonEmpty): the Boolean is the
      * reference's `if v.nonEmpty` test on the CLEANED (pre-normalize)
      * value, which gates the per-field sentinel fallback.
      *
      * Label matching runs over the \n-as-space view (the composition
      * replaces '\n' with ' ' BEFORE the label replace, so a label broken
      * across a newline must still match) — spec-pinned equal to
      * normalizeField(textContentCleaned) in TextSpec.
      */
    def textContentNormalized: (String, Boolean) = {
      val sb = new java.lang.StringBuilder
      appendTo(sb)
      var i = 0
      var j = sb.length
      while (i < j && graft.text.PyText.isPySpace(sb.charAt(i))) i += 1
      while (j > i && graft.text.PyText.isPySpace(sb.charAt(j - 1))) j -= 1
      if (i >= j) return ("", false)
      val label = graft.text.PyText.AnswerLabel
      val L = label.length
      val l0 = label.charAt(0)
      def chAt(k: Int): Char = {
        val c = sb.charAt(k)
        if (c == '\n') ' ' else c
      }
      def labelAt(k: Int): Boolean = {
        if (k + L > j) return false
        var t = 0
        while (t < L) {
          if (chAt(k + t) != label.charAt(t)) return false
          t += 1
        }
        true
      }
      val out = new java.lang.StringBuilder(j - i)
      var pendingSpace = false
      var k = i
      while (k < j) {
        val c = chAt(k)
        if (c == l0 && labelAt(k)) { pendingSpace = true; k += L }
        else if (graft.text.PyText.isPySpace(c)) { pendingSpace = true; k += 1 }
        else {
          if (pendingSpace && out.length > 0) out.append(' ')
          out.append(c)
          pendingSpace = false
          k += 1
        }
      }
      (out.toString, true)
    }

    /** First element (document order, self included) with the given id. */
    def findById(id: String): Option[Element] = {
      if (attrs.get("id").contains(id)) return Some(this)
      children.foreach {
        case e: Element =>
          val r = e.findById(id)
          if (r.isDefined) return r
        case _ =>
      }
      None
    }
  }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextTags = Set("script", "style")

  /** True when position `p` ends a close-tag NAME (whitespace, '/', '>',
    * or end of input) — the HTML5 rule for leaving a raw-text element.
    */
  private def isCloseNameEnd(s: String, p: Int): Boolean =
    p >= s.length || {
      val c = s.charAt(p)
      c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
        c == '\r' || c == '\f'
    }

  /** HTML4 named entities (the set lxml's parser resolves): XML basics,
    * the full Latin-1 block (U+00A0-U+00FF, names in codepoint order),
    * general punctuation/symbols, and Greek letters — the prior 11-name
    * subset left &mdash;/&hellip;/&eacute; and friends as literal text,
    * silently diverging byte-for-byte from the reference extraction on
    * any page using them. Semicolon-less legacy forms are NOT decoded
    * (documented divergence; rare).
    */
  private val namedEntities: Map[String, String] = {
    val latin1Names = Array( // names for U+00A0..U+00FF, in codepoint order
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
      "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot", "cedil",
      "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
      "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
      "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
      "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
      "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
      "atilde", "auml", "aring", "aelig", "ccedil", "egrave", "eacute",
      "ecirc", "euml", "igrave", "iacute", "icirc", "iuml", "eth", "ntilde",
      "ograve", "oacute", "ocirc", "otilde", "ouml", "divide", "oslash",
      "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    val latin1 = latin1Names.zipWithIndex.map { case (n, i) =>
      n -> (0xa0 + i).toChar.toString
    }
    val greekUpperNames = Array("Alpha", "Beta", "Gamma", "Delta", "Epsilon",
      "Zeta", "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi",
      "Omicron", "Pi", "Rho", "Sigma", "Tau", "Upsilon", "Phi", "Chi",
      "Psi", "Omega")
    // uppercase Greek skips U+03A2 (there is no capital final sigma): the
    // hole sits AFTER Rho (index 16), so Sigma (17) onward shift by one
    val greekUpper = greekUpperNames.zipWithIndex.map { case (n, i) =>
      n -> (0x391 + i + (if (i >= 17) 1 else 0)).toChar.toString
    }
    val greekLower = greekUpperNames.zipWithIndex.map { case (n, i) =>
      n.toLowerCase(java.util.Locale.ROOT) ->
        (0x3b1 + i + (if (i >= 17) 1 else 0)).toChar.toString
    }
    val misc = Map(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "zwnj" -> "\u200c", "zwj" -> "\u200d", "lrm" -> "\u200e",
      "rlm" -> "\u200f", "ensp" -> "\u2002", "emsp" -> "\u2003",
      "thinsp" -> "\u2009", "ndash" -> "\u2013", "mdash" -> "\u2014",
      "lsquo" -> "\u2018", "rsquo" -> "\u2019", "sbquo" -> "\u201a",
      "ldquo" -> "\u201c", "rdquo" -> "\u201d", "bdquo" -> "\u201e",
      "dagger" -> "\u2020", "Dagger" -> "\u2021", "bull" -> "\u2022",
      "hellip" -> "\u2026", "permil" -> "\u2030", "prime" -> "\u2032",
      "Prime" -> "\u2033", "lsaquo" -> "\u2039", "rsaquo" -> "\u203a",
      "oline" -> "\u203e", "frasl" -> "\u2044", "euro" -> "\u20ac",
      "trade" -> "\u2122", "minus" -> "\u2212", "fnof" -> "\u0192",
      "circ" -> "\u02c6", "tilde" -> "\u02dc", "OElig" -> "\u0152",
      "oelig" -> "\u0153", "Scaron" -> "\u0160", "scaron" -> "\u0161",
      "Yuml" -> "\u0178", "larr" -> "\u2190", "uarr" -> "\u2191",
      "rarr" -> "\u2192", "darr" -> "\u2193", "harr" -> "\u2194",
      "infin" -> "\u221e", "ne" -> "\u2260", "le" -> "\u2264",
      "ge" -> "\u2265", "asymp" -> "\u2248", "equiv" -> "\u2261",
      "sigmaf" -> "\u03c2")
    misc ++ latin1 ++ greekUpper ++ greekLower
  }

  /** Decode &name; &#nnn; &#xhh; references; unknown refs pass through. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(name.substring(2), 16))))
              catch { case _: Exception => None }
            else if (name.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(name.substring(1)))))
              catch { case _: Exception => None }
            else namedEntities.get(name)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse; returns None when the document contains no element (the lxml
    * "Document is empty" error case).
    */
  def parse(html: String): Option[Element] = {
    if (html == null) return None
    val root = new Element("#document", Map.empty)
    val stack = ArrayBuffer[Element](root)
    def top = stack.last
    var i = 0
    val n = html.length
    var sawElement = false

    def appendText(raw: String): Unit =
      if (raw.nonEmpty) top.children += Text(decodeEntities(raw))

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(html.substring(i)); i = n }
      else {
        if (lt > i) appendText(html.substring(i, lt))
        if (lt + 1 >= n) { appendText("<"); i = n }
        else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '?' =>
            val end = html.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          case '/' =>
            val end = html.indexOf('>', lt)
            if (end < 0) i = n
            else {
              val tag = html.substring(lt + 2, end).trim.toLowerCase(java.util.Locale.ROOT)
              // close matching open tag if present anywhere in the stack
              val idx = stack.lastIndexWhere(_.tag == tag)
              if (idx > 0) stack.remove(idx, stack.length - idx)
              i = end + 1
            }
          case c if c.isLetter =>
            val (el, selfClosed, next) = parseOpenTag(html, lt)
            sawElement = true
            top.children += el
            i = next
            if (!selfClosed && !voidTags.contains(el.tag)) {
              if (rawTextTags.contains(el.tag)) {
                // raw text until the matching close tag, case-insensitive;
                // the name must END there (whitespace / '/' / '>') — a
                // prefix match alone would cut '<style>a</styles>b</style>'
                // at '</styles' where lxml keeps scanning
                val closeTag = "</" + el.tag
                val lower = html
                var j = i
                var found = -1
                while (found < 0 && j < n) {
                  val k = lower.indexOf('<', j)
                  if (k < 0) j = n
                  else if (lower.regionMatches(true, k, closeTag, 0, closeTag.length) &&
                      isCloseNameEnd(lower, k + closeTag.length)) found = k
                  else j = k + 1
                }
                if (found < 0) {
                  if (i < n) el.children += Text(html.substring(i))
                  i = n
                } else {
                  if (found > i) el.children += Text(html.substring(i, found))
                  val end = html.indexOf('>', found)
                  i = if (end < 0) n else end + 1
                }
              } else stack += el
            }
          case _ =>
            appendText("<")
            i = lt + 1
        }
      }
    }
    if (!sawElement) {
      // lxml's fromstring wraps ELEMENT-FREE input that still has text in a
      // synthetic element (only truly empty/whitespace input raises
      // "Document is empty") — so bare text must parse to a tree whose
      // container lookup misses (per-field sentinel path), not to the
      // full-sentinel parse-error path.
      val hasText = root.children.exists {
        case Text(v) => v.exists(c => !graft.text.PyText.isPySpace(c))
        case _ => false
      }
      if (!hasText) None
      else {
        val wrap = new Element("p", Map.empty)
        root.children.foreach(wrap.children += _)
        root.children.clear()
        root.children += wrap
        Some(root)
      }
    } else Some(root)
  }

  // ---- streaming container parse ------------------------------------------

  /** Outcome of [[parseContainer]], mirroring the full parse's three
    * observable cases: no parseable document (lxml raises), a document whose
    * id lookup misses, or the materialized container subtree.
    */
  sealed trait ContainerResult
  case object EmptyDoc extends ContainerResult
  case object NoContainer extends ContainerResult
  final case class FoundContainer(el: Element) extends ContainerResult

  private final class TagScan {
    var tagEnd = 0
    var selfClosed = false
    var next = 0
    var idStart = -1 // -1 = no id attr; start==end==0 = valueless id attr
    var idEnd = -1
  }

  /** Attribute-region scan with the EXACT traversal of parseOpenTag, but no
    * Map/Element allocation — records only where the tag name ends, whether
    * the tag self-closes, where scanning resumes, and the (raw) value span
    * of the last `id` attribute (last wins, like the attr-map overwrite).
    */
  private def scanTag(html: String, lt: Int, out: TagScan): Unit = {
    val n = html.length
    var i = lt + 1
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    out.tagEnd = i
    out.selfClosed = false
    out.idStart = -1
    out.idEnd = -1
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { out.selfClosed = true; i += 2; done = true }
          else i += 1
        case _ =>
          val nameStart = i
          while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val nameEnd = i
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var vS = -1
          var vE = -1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              i += 1
              vS = i
              while (i < n && html.charAt(i) != q) i += 1
              vE = i
              if (i < n) i += 1
            } else {
              vS = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              vE = i
            }
          }
          if (nameEnd - nameStart == 2 && html.regionMatches(true, nameStart, "id", 0, 2)) {
            if (vS >= 0) { out.idStart = vS; out.idEnd = vE }
            else { out.idStart = 0; out.idEnd = 0 } // valueless attr → ""
          }
      }
    }
    out.next = i
  }

  /** Streaming single-subtree parse — the extract-stage scale path. The
    * extractor reads ~6 positional paths under ONE container div
    * (parser.py:337-358), so building a full DOM for the page is pure
    * allocation bandwidth: this scanner skips everything before the
    * `id`-matched element without allocating nodes (a tag-name stack is the
    * only state), materializes ONLY the container's subtree — with
    * [[TextSpan]] zero-copy text nodes — and STOPS at the subtree's close
    * tag, never touching the rest of the document.
    *
    * Observable-equivalence contract with the full parse (spec-enforced,
    * ExtractorSpec "streaming == full"): for every input,
    * parse(html).flatMap(_.findById(id)) and this function agree on
    * EmptyDoc / NoContainer / the container's extracted text content —
    * including the lxml edge cases: bare-text wrapping (→ NoContainer),
    * whitespace/empty/null input (→ EmptyDoc), stray close tags that pop
    * ancestors (ends the subtree here exactly where the full parse would
    * re-parent subsequent content OUTSIDE the container), raw script/style
    * text (undecoded), void/self-closing tags, entity-bearing id values.
    */
  def parseContainer(html: String, id: String): ContainerResult = {
    if (html == null) return EmptyDoc
    val n = html.length
    val tags = ArrayBuffer[String]("#document")
    val els = ArrayBuffer[Element](null.asInstanceOf[Element])
    var containerIdx = -1
    var container: Element = null
    var sawElement = false
    var hasText = false
    val scan = new TagScan
    var i = 0

    def appendSpan(start: Int, end: Int): Unit = {
      if (end <= start) return
      if (container != null) {
        val a = html.indexOf('&', start)
        els(els.length - 1).children += new TextSpan(html, start, end, a >= 0 && a < end)
      } else if (!sawElement && !hasText) {
        // bare-text detection (lxml wraps element-free text; only fully
        // empty input raises) — decode first: "&nbsp;" is all-whitespace
        val dec = decodeEntities(html.substring(start, end))
        var k = 0
        while (!hasText && k < dec.length) {
          if (!graft.text.PyText.isPySpace(dec.charAt(k))) hasText = true
          k += 1
        }
      }
    }

    // raw text until the matching close tag, case-insensitive; returns the
    // span end (exclusive) and advances past the close tag via the caller.
    // Same name-boundary rule as the full parse ('</styles>' is raw text,
    // not a close of '</style') so streaming == full stays exact.
    def rawTextEnd(tag: String, from: Int): Int = {
      val closeTag = "</" + tag
      var j = from
      var found = -1
      while (found < 0 && j < n) {
        val k = html.indexOf('<', j)
        if (k < 0) j = n
        else if (html.regionMatches(true, k, closeTag, 0, closeTag.length) &&
            isCloseNameEnd(html, k + closeTag.length)) found = k
        else j = k + 1
      }
      found
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendSpan(i, n); i = n }
      else {
        if (lt > i) appendSpan(i, lt)
        if (lt + 1 >= n) { appendSpan(lt, lt + 1); i = n }
        else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '?' =>
            val end = html.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          case '/' =>
            val end = html.indexOf('>', lt)
            if (end < 0) i = n
            else {
              val tag = html.substring(lt + 2, end).trim.toLowerCase(java.util.Locale.ROOT)
              val idx = tags.lastIndexWhere(_ == tag)
              if (idx > 0) {
                // popping the container frame (or an ancestor) means the
                // subtree is complete: the full parse would re-parent
                // everything after this point OUTSIDE the container
                if (containerIdx >= 0 && idx <= containerIdx)
                  return FoundContainer(container)
                tags.remove(idx, tags.length - idx)
                els.remove(idx, els.length - idx)
              }
              i = end + 1
            }
          case c if c.isLetter =>
            sawElement = true
            scanTag(html, lt, scan)
            if (container == null) {
              val isContainer = scan.idStart >= 0 && {
                val raw = html.substring(scan.idStart, scan.idEnd)
                (if (raw.indexOf('&') >= 0) decodeEntities(raw) else raw) == id
              }
              if (isContainer) {
                // build the container itself with full attrs (one per page)
                val (el, selfClosed, next) = parseOpenTag(html, lt)
                container = el
                i = next
                if (selfClosed || voidTags.contains(el.tag))
                  return FoundContainer(container)
                if (rawTextTags.contains(el.tag)) {
                  val found = rawTextEnd(el.tag, i)
                  if (found < 0) {
                    if (i < n) el.children += new TextSpan(html, i, n, false)
                  } else if (found > i)
                    el.children += new TextSpan(html, i, found, false)
                  return FoundContainer(container)
                }
                tags += el.tag
                els += el
                containerIdx = tags.length - 1
              } else {
                val tag = html.substring(lt + 1, scan.tagEnd).toLowerCase(java.util.Locale.ROOT)
                i = scan.next
                if (!scan.selfClosed && !voidTags.contains(tag)) {
                  if (rawTextTags.contains(tag)) {
                    val found = rawTextEnd(tag, i)
                    if (found < 0) i = n
                    else {
                      val end = html.indexOf('>', found)
                      i = if (end < 0) n else end + 1
                    }
                  } else { tags += tag; els += null.asInstanceOf[Element] }
                }
              }
            } else {
              // build mode: inner attrs are never read by the extractor —
              // skip the Map, keep the traversal identical
              val tag = html.substring(lt + 1, scan.tagEnd).toLowerCase(java.util.Locale.ROOT)
              val el = new Element(tag, Map.empty)
              els(els.length - 1).children += el
              i = scan.next
              if (!scan.selfClosed && !voidTags.contains(tag)) {
                if (rawTextTags.contains(tag)) {
                  val found = rawTextEnd(tag, i)
                  if (found < 0) {
                    if (i < n) el.children += new TextSpan(html, i, n, false)
                    i = n
                  } else {
                    if (found > i) el.children += new TextSpan(html, i, found, false)
                    val end = html.indexOf('>', found)
                    i = if (end < 0) n else end + 1
                  }
                } else { tags += tag; els += el }
              }
            }
          case _ =>
            appendSpan(lt, lt + 1)
            i = lt + 1
        }
      }
    }
    if (container != null) FoundContainer(container)
    else if (!sawElement && !hasText) EmptyDoc
    else NoContainer
  }

  /** Parse an open tag starting at `lt`; returns (element, selfClosed, nextIndex). */
  private def parseOpenTag(html: String, lt: Int): (Element, Boolean, Int) = {
    val n = html.length
    var i = lt + 1
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val tag = html.substring(tagStart, i).toLowerCase(java.util.Locale.ROOT)
    var attrs = Map.newBuilder[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClosed = true; i += 2; done = true }
          else i += 1
        case _ =>
          val nameStart = i
          while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val name = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var value = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              i += 1
              val vStart = i
              while (i < n && html.charAt(i) != q) i += 1
              value = html.substring(vStart, i)
              if (i < n) i += 1
            } else {
              val vStart = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              value = html.substring(vStart, i)
            }
          }
          if (name.nonEmpty) attrs += name -> decodeEntities(value)
      }
    }
    (new Element(tag, attrs.result()), selfClosed, i)
  }
}

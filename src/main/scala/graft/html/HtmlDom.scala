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
  final class Element(val tag: String, val attrs: Map[String, String]) extends Node {
    val children: ArrayBuffer[Node] = new ArrayBuffer[Node]()

    def elementChildren(childTag: String): IndexedSeq[Element] =
      children.collect { case e: Element if e.tag == childTag => e }.toIndexedSeq

    /** lxml `text_content()`: all descendant text in document order. */
    def textContent: String = {
      val sb = new java.lang.StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(v)
        case e: Element => e.children.foreach(walk)
      }
      walk(this)
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
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(v)
        case e: Element => e.children.foreach(walk)
      }
      walk(this)
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

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "zwnj" -> "\u200c", "zwj" -> "\u200d", "shy" -> "\u00ad",
    "copy" -> "©", "laquo" -> "«", "raquo" -> "»")

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
              val tag = html.substring(lt + 2, end).trim.toLowerCase
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
                // raw text until the matching close tag, case-insensitive
                val closeTag = "</" + el.tag
                val lower = html
                var j = i
                var found = -1
                while (found < 0 && j < n) {
                  val k = lower.indexOf('<', j)
                  if (k < 0) j = n
                  else if (lower.regionMatches(true, k, closeTag, 0, closeTag.length)) found = k
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

  /** Parse an open tag starting at `lt`; returns (element, selfClosed, nextIndex). */
  private def parseOpenTag(html: String, lt: Int): (Element, Boolean, Int) = {
    val n = html.length
    var i = lt + 1
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val tag = html.substring(tagStart, i).toLowerCase
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
          val name = html.substring(nameStart, i).toLowerCase
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

package graft.extract

import graft.html.HtmlDom
import graft.html.HtmlDom.Element
import graft.model.{Extracted, JDate}
import graft.text.{JalaliDate, PyText}

/** The extraction operator — transliteration of the reference's
  * `HTMLParser.parse` (/root/reference/src/parser.py:185-367) with
  * byte-identical output semantics. Pure Scala function, used from Spark as
  * a typed `Dataset.map` (SURVEY.md §2.3/§2.10); no Catalyst surface needed
  * because the invariant is per-row scalar work.
  */
object Extractor extends Serializable {

  val QuestionSentinel = "سوال نامشخص"
  val AnswerSentinel = "پاسخ نامشخص"
  val ContentSentinel = "محتوای نامشخص"
  val Unknown = "نامشخص"
  val DefaultDate = "0001/01/01"

  /** The error-page sentinel filter (/root/reference/src/handler.py:40-53). */
  val ErrorSentinel = "خطایی رخ داده است"
  def isValidHtml(html: String): Boolean = !html.contains(ErrorSentinel)

  private val ContainerId = "mvcContainer-1286"

  /** Resolve an lxml-style positional child path: each step selects the
    * i-th (1-based) `div` element child; i=1 when the XPath step has no
    * predicate. Returns all matches in document order (the reference takes
    * `content[0]`, parser.py:337-340). Scans `children` in place — no
    * per-step collection allocation (this path runs once per field per
    * page; the extract stage is allocation-bandwidth-bound at scale).
    */
  private def resolvePath(start: Element, steps: Seq[Int]): List[Element] = {
    var current: List[Element] = List(start)
    steps.foreach { idx =>
      val next = List.newBuilder[Element]
      current.foreach { el =>
        if (idx == 0) { // 0 = all div children (unpredicated step)
          el.children.foreach {
            case e: HtmlDom.Element if e.tag == "div" => next += e
            case _ =>
          }
        } else {
          var seen = 0
          val it = el.children.iterator
          var found = false
          while (it.hasNext && !found) {
            it.next() match {
              case e: HtmlDom.Element if e.tag == "div" =>
                seen += 1
                if (seen == idx) { next += e; found = true }
              case _ =>
            }
          }
        }
      }
      current = next.result()
    }
    current
  }

  /** `_extract_content` (/root/reference/src/parser.py:326-340):
    * first match's `text_content().strip().replace('\n', ' ')`, or None.
    */
  private def extractAt(container: Element, steps: Seq[Int]): Option[String] =
    resolvePath(container, steps).headOption.map(_.textContentCleaned)

  // XPath suffixes under //*[@id="mvcContainer-1286"], as positional div
  // steps (0 = unpredicated /div = first div child for single-child shapes;
  // here all unpredicated steps resolve to every div child like XPath does).
  // //*[@id]/div/div/div[2]/div  → prefix
  private val Prefix = Seq(0, 0, 2, 0)
  private val FileNumberPath = Prefix ++ Seq(1, 2, 2) // div[1]/div[2]/div[2] parser.py:273
  private val OpinionNumberPath = Prefix ++ Seq(1, 2, 1) // parser.py:274
  private val OpinionDatePath = Prefix ++ Seq(1, 2, 3) // parser.py:275
  private val ContentPath = Prefix ++ Seq(2) // parser.py:349
  private val QuestionPath = ContentPath ++ Seq(0, 2, 0) // /div/div[2]/div parser.py:358
  private val AnswerPath = ContentPath ++ Seq(0, 4, 0) // /div/div[4]/div parser.py:367

  private def fullSentinelRow(url: String, fileId: String): Extracted =
    Extracted(url, fileId, QuestionSentinel, AnswerSentinel, ContentSentinel,
      Unknown, Unknown, DefaultDate, DefaultDate)

  /** Tree parsed but XPaths all miss: per-field fallbacks
    * (question/answer sentinels; content = "q a"; metadata defaults).
    */
  private def noContainerRow(url: String, fileId: String): Extracted = {
    val q = QuestionSentinel
    val a = AnswerSentinel
    val c = PyText.normalizeField(s"$q $a")
    Extracted(url, fileId, PyText.normalizeField(q), PyText.normalizeField(a), c,
      Unknown, Unknown, DefaultDate, DefaultDate)
  }

  private def fromContainer(url: String, fileId: String, container: Element): Extracted = {
    val fileNumber = extractAt(container, FileNumberPath) match {
      case Some(v) if v.nonEmpty =>
        PyText.cleanMetadataField(v) // applied twice in the reference
      case _ => Unknown
    }
    val opinionNumber = extractAt(container, OpinionNumberPath) match {
      case Some(v) if v.nonEmpty => PyText.cleanMetadataField(v)
      case _ => Unknown
    }
    // opinion_date: raw text → regex search → process_date
    // (parser.py:297-322); no match or missing → default dates
    val date: JDate = extractAt(container, OpinionDatePath) match {
      case Some(v) if v.nonEmpty =>
        JalaliDate.searchDatePattern(v) match {
          case Some(ymd) =>
            val (sh, gr) = JalaliDate.processDate(ymd)
            JDate(sh, gr)
          case None => JDate(DefaultDate, DefaultDate)
        }
      case _ => JDate(DefaultDate, DefaultDate)
    }
    // q/a/content use the FUSED walk+normalize (textContentNormalized): the
    // naive composition copies each KB-scale content string four times and
    // is the extract stage's dominant allocation. The Boolean is the
    // reference's nonEmpty test on the pre-normalization cleaned value.
    def normalizedAt(steps: Seq[Int]): Option[(String, Boolean)] =
      resolvePath(container, steps).headOption.map(_.textContentNormalized)
    val question = normalizedAt(QuestionPath) match {
      case Some((norm, true)) => norm
      case _ => PyText.normalizeField(QuestionSentinel)
    }
    val answer = normalizedAt(AnswerPath) match {
      case Some((norm, true)) => norm
      case _ => PyText.normalizeField(AnswerSentinel)
    }
    val content = normalizedAt(ContentPath) match {
      case Some((norm, true)) => norm
      case _ =>
        // fallback composes the RAW cleaned values (parser.py:231) — a
        // label could span the "q a" join, so normalized pieces cannot be
        // concatenated; re-walk the two subtrees on this rare path
        val questionRaw = extractAt(container, QuestionPath)
          .filter(_.nonEmpty).getOrElse(QuestionSentinel)
        val answerRaw = extractAt(container, AnswerPath)
          .filter(_.nonEmpty).getOrElse(AnswerSentinel)
        PyText.normalizeField(s"$questionRaw $answerRaw")
    }
    Extracted(url, fileId, question, answer, content,
      fileNumber, opinionNumber, date.shamsi, date.gregorian)
  }

  /** Streaming parse + extract — mirrors HTMLParser.parse error handling:
    * any failure to build a tree yields the full-sentinel row
    * (parser.py:248-256); missing sections yield per-field sentinels
    * (parser.py:212-234). Only the mvcContainer subtree is materialized
    * (HtmlDom.parseContainer): everything before it is scanned without
    * node allocation, everything after its close tag is never touched —
    * the extract stage is allocation-bandwidth-bound at scale, and the
    * ~6 consumed paths all live under this one div.
    */
  def extract(url: String, fileId: String, htmlText: String): Extracted = {
    val result =
      try HtmlDom.parseContainer(htmlText, ContainerId)
      // NonFatal only: an OOM/LinkageError must fail the task (retryable),
      // not silently become a sentinel data row
      catch { case scala.util.control.NonFatal(_) => HtmlDom.EmptyDoc }
    result match {
      case HtmlDom.EmptyDoc => fullSentinelRow(url, fileId)
      case HtmlDom.NoContainer => noContainerRow(url, fileId)
      case HtmlDom.FoundContainer(container) => fromContainer(url, fileId, container)
    }
  }

  /** The same extraction over the FULL-tree parser — the reference path the
    * streaming parse must be observably equivalent to (ExtractorSpec
    * "streaming == full" exercises both over fixtures + adversarial HTML).
    */
  private[graft] def extractViaFullParse(url: String, fileId: String,
      htmlText: String): Extracted = {
    val rootOpt =
      try HtmlDom.parse(htmlText)
      catch { case scala.util.control.NonFatal(_) => None }
    rootOpt match {
      case None => fullSentinelRow(url, fileId)
      case Some(root) =>
        root.findById(ContainerId) match {
          case None => noContainerRow(url, fileId)
          case Some(container) => fromContainer(url, fileId, container)
        }
    }
  }

  def extractBytes(url: String, fileId: String, html: Array[Byte]): Extracted =
    extract(url, fileId,
      if (html == null) "" else new String(html, java.nio.charset.StandardCharsets.UTF_8))
}

package graft.url

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** URL canonicalization + keying for the frontier (north_rule: seen-set over
  * canonicalized + SHA-256 URL keys). The reference keys pages by
  * site-native integer ids (/root/reference/src/_core/schemas.py:45); at
  * web scale the key must be derived from the URL itself, so: canonicalize
  * (idempotent — property-tested) then sha2-256 hex.
  */
object Urls extends Serializable {

  /** Canonical form: lowercase scheme+host, default ports stripped,
    * fragment dropped, dot-segments resolved, query params sorted (stable),
    * empty query/path normalized, percent-encoding upper-cased with
    * unreserved chars decoded.
    */
  def canonicalize(raw: String): String = {
    if (raw == null) return ""
    val s = raw.trim
    if (s.isEmpty) return ""
    // split off fragment first
    val noFrag = { val h = s.indexOf('#'); if (h >= 0) s.substring(0, h) else s }
    val schemeEnd = noFrag.indexOf("://")
    // a URL is absolute only when the text before "://" is a REAL scheme
    // (RFC 3986 ALPHA *(ALPHA/DIGIT/+/-/.)): a relative URL carrying an
    // absolute URL in its query ("page?a=http://h.ir") must take the
    // pass-through branch, not parse "page?a=http" as a scheme. ONE
    // scheme grammar for keying and reference resolution: a valid scheme
    // prefix puts its FIRST colon exactly at "://"
    val schemeValid = schemeEnd > 0 && schemeColon(noFrag) == schemeEnd
    if (!schemeValid) return normPercent(noFrag) // not absolute; leave mostly as-is
    val scheme = noFrag.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = noFrag.substring(schemeEnd + 3)
    val pathStart = { val i = rest.indexOf('/'); if (i >= 0) i else rest.length }
    val qInAuth = rest.indexOf('?')
    val authEnd = if (qInAuth >= 0 && qInAuth < pathStart) qInAuth else pathStart
    var authority = rest.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    // strip default port
    val defaultPort = scheme match { case "http" => ":80"; case "https" => ":443"; case _ => "" }
    if (defaultPort.nonEmpty && authority.endsWith(defaultPort))
      authority = authority.substring(0, authority.length - defaultPort.length)
    val afterAuth = rest.substring(authEnd)
    val qIdx = afterAuth.indexOf('?')
    val pathRaw = if (qIdx >= 0) afterAuth.substring(0, qIdx) else afterAuth
    val queryRaw = if (qIdx >= 0) afterAuth.substring(qIdx + 1) else null
    val path = resolveDotSegments(normPercent(if (pathRaw.isEmpty) "/" else pathRaw))
    // all-empty param lists ("?", "?&", "?&&") normalize to NO query —
    // emitting a bare "?" would make canonicalize non-idempotent (a second
    // pass strips it) and key the same page twice
    val query =
      if (queryRaw == null || queryRaw.isEmpty) ""
      else {
        val parts = queryRaw.split("&", -1).filter(_.nonEmpty).map(normPercent)
        if (parts.isEmpty) ""
        else "?" + parts.sorted(Ordering.String).mkString("&")
      }
    s"$scheme://$authority$path$query"
  }

  /** Uppercase hex in %XX escapes; decode escapes of unreserved chars. */
  private def normPercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def isUnreserved(v: Int): Boolean = {
    val c = v.toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
    c == '-' || c == '.' || c == '_' || c == '~'
  }

  /** RFC 3986 dot-segment removal. A path ending in "/." or "/.." keeps
    * its trailing slash (the RFC's remove_dot_segments and every browser
    * resolve "/a/b/.." to "/a/", not "/a" — a distinct resource on most
    * servers).
    */
  private def resolveDotSegments(path: String): String = {
    if (!path.contains("./") && !path.endsWith("/.") && !path.endsWith("/..")) return path
    val endsDir = path.endsWith("/.") || path.endsWith("/..")
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    path.split("/", -1).foreach {
      case "." =>
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    val joined = out.mkString("/")
    val base = if (joined.startsWith("/")) joined else "/" + joined.dropWhile(_ == '/')
    if (endsDir && !base.endsWith("/")) base + "/" else base
  }

  /** Registered host (lowercased), empty string when unparseable. */
  def host(url: String): String = {
    if (url == null) return ""
    val i = url.indexOf("://")
    if (i < 0) return ""
    val rest = url.substring(i + 3)
    var end = rest.length
    var j = 0
    var found = false
    while (j < rest.length && !found) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { end = j; found = true }
      j += 1
    }
    val auth = rest.substring(0, end)
    val at = auth.lastIndexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    // IPv6 literals are bracketed and full of colons — take through ']'
    // (splitting on the first ':' collapsed every IPv6 site to host "[")
    val h =
      if (hostPort.startsWith("[")) {
        val e = hostPort.indexOf(']')
        if (e >= 0) hostPort.substring(0, e + 1) else hostPort
      } else {
        val colon = hostPort.indexOf(':')
        if (colon >= 0) hostPort.substring(0, colon) else hostPort
      }
    h.toLowerCase(java.util.Locale.ROOT)
  }

  /** Index of ':' ending a valid RFC 3986 scheme prefix (ALPHA
    * *(ALPHA/DIGIT/+/-/.)), else -1. Covers both hierarchical ("http://…")
    * and opaque ("mailto:…", "javascript:…") forms.
    */
  private def schemeColon(s: String): Int = {
    if (s == null || s.isEmpty) return -1
    val colon = s.indexOf(':')
    if (colon <= 0) return -1
    val c0 = s.charAt(0)
    val alpha0 = (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')
    if (!alpha0) return -1
    var i = 1
    while (i < colon) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return -1
      i += 1
    }
    colon
  }

  /** RFC 3986 §5.2 reference resolution — the piece a GENERAL crawler
    * needs that the reference never did (its outlinks are site-native
    * absolute hrefs, /root/reference/src/html_converter.py; Common-Crawl
    * pages link relatively more often than not). Returns the resolved
    * absolute URL, NOT canonicalized (callers canonicalize, which also
    * resolves the dot-segments a merged relative path introduces), or ""
    * when neither ref nor base yields an absolute URL (caller drops).
    *
    * Handled forms: absolute ref (any scheme, incl. opaque mailto:/
    * javascript: — returned verbatim for the caller to filter),
    * scheme-relative "//h/p", absolute-path "/p", relative path "p",
    * query-only "?q", fragment-only "#f" (fragment always drops — the
    * frontier keys pages, not in-page anchors).
    */
  def resolve(base: String, ref: String): String = {
    val r = if (ref == null) "" else ref.trim
    if (schemeColon(r) >= 0) return r // absolute (hierarchical or opaque)
    val b = if (base == null) "" else base.trim
    val schemeEnd = b.indexOf("://")
    if (schemeEnd <= 0 || schemeColon(b) != schemeEnd) return ""
    val scheme = b.substring(0, schemeEnd)
    if (r.isEmpty) { val h = b.indexOf('#'); return if (h >= 0) b.substring(0, h) else b }
    if (r.startsWith("//")) return scheme + ":" + r
    val noFragB = { val h = b.indexOf('#'); if (h >= 0) b.substring(0, h) else b }
    val rest = noFragB.substring(schemeEnd + 3)
    val pathStart = {
      // authority ends at the first of / ? (query can precede any path)
      val slash = rest.indexOf('/'); val q = rest.indexOf('?')
      if (slash < 0 && q < 0) rest.length
      else if (slash < 0) q else if (q < 0) slash else math.min(slash, q)
    }
    val origin = scheme + "://" + rest.substring(0, pathStart)
    val afterAuth = rest.substring(pathStart)
    val qIdx = afterAuth.indexOf('?')
    val basePath = if (qIdx >= 0) afterAuth.substring(0, qIdx) else afterAuth
    if (r.startsWith("#")) origin + basePath +
      (if (qIdx >= 0) afterAuth.substring(qIdx) else "")
    else if (r.startsWith("?")) origin + basePath + r
    else if (r.startsWith("/")) origin + r
    else {
      // merge: base path up to (incl.) its last '/', or "/" when the
      // base has no path (RFC 3986 §5.2.3's merge with defined authority)
      val lastSlash = basePath.lastIndexOf('/')
      val dir = if (lastSlash < 0) "/" else basePath.substring(0, lastSlash + 1)
      origin + dir + r
    }
  }

  /** Declarative (codegen'd, UDF-free) twin of [[host]] for column
    * pipelines that must agree with the frontier's `host` values (which
    * come from `Urls.host` via typed code, e.g.
    * FrontierRound.scala:113): authority after the first "://" up to
    * /?#, userinfo stripped at the LAST '@', port stripped with IPv6
    * brackets kept whole, lowercased; "" when unparseable (incl. null).
    * Any divergence breaks host-keyed joins SILENTLY (a rank/metric row
    * for "Example.com:8443" never matches frontier host "example.com"),
    * so UrlsSpec pins column==scalar parity on the adversarial set.
    */
  def hostColumn(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val auth = regexp_extract(url, "://([^/?#]+)", 1)
    val hp = element_at(split(auth, "@", -1), -1)
    val h = when(hp.startsWith("["),
        when(instr(hp, "]") > 0, hp.substr(lit(1), instr(hp, "]"))).otherwise(hp))
      .otherwise(substring_index(hp, ":", 1))
    lower(coalesce(h, lit("")))
  }

  /** Frontier key: sha2-256 hex of the canonical URL (north_rule). */
  def urlKey(url: String): String = sha256Hex(canonicalize(url))

  private val HexChars = "0123456789abcdef".toCharArray

  // one digest instance per thread: getInstance() allocates (provider
  // lookup + object) on every call, and urlKey runs once per discovered
  // outlink on the crawl hot path; digest() leaves the instance reset
  private val Sha = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  def sha256Hex(s: String): String = {
    val md = Sha.get()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // manual hex loop: an f"%02x" interpolator here costs a
    // java.util.Formatter instantiation PER BYTE — 32 per key, measured as
    // the dominant term of this function on the crawl hot path (every
    // outlink of every fetched page flows through urlKey)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      out(i * 2) = HexChars(v >>> 4)
      out(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  /** IdeaId extraction from a detail URL — the inverse of the reference's
    * URL construction (/root/reference/src/check_pages.py:151,162).
    */
  private val IdeaIdRe = "IdeaId=(\\d+)".r
  def ideaId(url: String): Option[String] =
    IdeaIdRe.findFirstMatchIn(if (url == null) "" else url).map(_.group(1))
}

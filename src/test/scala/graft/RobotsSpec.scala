package graft

import graft.frontier.{HostRules, RobotsRules}
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots evaluation: Allow/Disallow longest-match precedence,
  * `*`/`$` wildcards, and the parser's group handling.
  */
class RobotsSpec extends AnyFunSuite {

  private def rules(allow: Seq[String], disallow: Seq[String]) =
    RobotsRules(Map("h.ir" -> HostRules(None, None, disallow,
      Seq.empty, allow)))

  test("longest match wins; Allow beats Disallow on ties") {
    // the classic override: a blanket Disallow with a carve-out
    val r1 = rules(allow = Seq("/public"), disallow = Seq("/"))
    assert(r1.allowed("h.ir", "http://h.ir/public/doc.html"))
    assert(!r1.allowed("h.ir", "http://h.ir/private/doc.html"))
    // equal length → allow wins (RFC 9309 §2.2.2)
    val r2 = rules(allow = Seq("/folder"), disallow = Seq("/folder"))
    assert(r2.allowed("h.ir", "http://h.ir/folder/page"))
    // the longer DISALLOW beats a shorter allow
    val r3 = rules(allow = Seq("/page"), disallow = Seq("/*.htm"))
    assert(!r3.allowed("h.ir", "http://h.ir/page.htm"))
  }

  test("wildcards: * spans octets, trailing $ anchors the end") {
    val php = rules(allow = Seq.empty, disallow = Seq("/*.php"))
    assert(!php.allowed("h.ir", "http://h.ir/index.php"))
    assert(!php.allowed("h.ir", "http://h.ir/a/b.php?x=1"))
    assert(php.allowed("h.ir", "http://h.ir/windows.PHP") ) // case-sensitive paths
    val anchored = rules(allow = Seq.empty, disallow = Seq("/*.php$"))
    assert(!anchored.allowed("h.ir", "http://h.ir/a.php"))
    assert(anchored.allowed("h.ir", "http://h.ir/a.php5"))
    assert(anchored.allowed("h.ir", "http://h.ir/a.php?x=1"))
    // homepage-only allow: "/$" admits exactly the root
    val home = rules(allow = Seq("/$"), disallow = Seq("/"))
    assert(home.allowed("h.ir", "http://h.ir/"))
    assert(!home.allowed("h.ir", "http://h.ir/page"))
    // trailing * is a plain prefix; multiple * segments scan greedily
    val fish = rules(allow = Seq.empty, disallow = Seq("/fish*"))
    assert(!fish.allowed("h.ir", "http://h.ir/fishheads/yummy.html"))
    assert(fish.allowed("h.ir", "http://h.ir/catfish"))
    val multi = rules(allow = Seq.empty, disallow = Seq("/a/*/b/*.x$"))
    assert(!multi.allowed("h.ir", "http://h.ir/a/1/b/2.x"))
    assert(multi.allowed("h.ir", "http://h.ir/a/1/b/2.x.y"))
    assert(multi.allowed("h.ir", "http://h.ir/a/1/c/2.x"))
  }

  test("hosts without rules and unknown hosts stay allowed; plain prefixes unchanged") {
    val r = rules(allow = Seq.empty, disallow = Seq("/g"))
    assert(r.allowed("other.ir", "http://other.ir/g/x")) // host not in map
    assert(!r.allowed("h.ir", "http://h.ir/g/x")) // the pre-RFC prefix behavior
    assert(r.allowed("h.ir", "http://h.ir/ok"))
  }

  test("RFC 9309 §2.1: consecutive User-agent lines share one group") {
    val hr = RobotsRules.parseRobotsTxt(
      """User-agent: *
        |User-agent: googlebot
        |Disallow: /private
        |
        |User-agent: bingbot
        |Disallow: /bing-only
        |""".stripMargin)
    // '*' is in the first group's UA run → its rules apply to us;
    // bingbot's rules live in a fresh group and must NOT leak in
    assert(hr.disallow == Seq("/private"))
    // and the reverse order inside the run works too
    val hr2 = RobotsRules.parseRobotsTxt(
      "User-agent: googlebot\nUser-agent: *\nDisallow: /x\n")
    assert(hr2.disallow == Seq("/x"))
    // a rule line ENDS the run: a later User-agent starts a new group
    val hr3 = RobotsRules.parseRobotsTxt(
      "User-agent: *\nDisallow: /a\nUser-agent: googlebot\nDisallow: /g\n")
    assert(hr3.disallow == Seq("/a"))
    // OTHER records (Sitemap, unknown keys) MUST NOT interfere with
    // group parsing (§2.2.4): a UA run survives them
    val hr4 = RobotsRules.parseRobotsTxt(
      """User-agent: *
        |Sitemap: https://h.ir/s.xml
        |Host: h.ir
        |User-agent: googlebot
        |Disallow: /private
        |""".stripMargin)
    assert(hr4.disallow == Seq("/private"))
    assert(hr4.sitemaps == Seq("https://h.ir/s.xml"))
  }

  test("parser collects Allow in the star group only") {
    val hr = RobotsRules.parseRobotsTxt(
      """User-agent: googlebot
        |Allow: /google-only
        |User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |""".stripMargin)
    assert(hr.allow == Seq("/private/ok"))
    assert(hr.disallow == Seq("/private"))
    val r = RobotsRules(Map("h.ir" -> hr))
    assert(!r.allowed("h.ir", "http://h.ir/private/no"))
    assert(r.allowed("h.ir", "http://h.ir/private/ok/doc"))
  }
}

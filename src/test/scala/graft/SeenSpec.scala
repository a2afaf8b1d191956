package graft

import graft.seen.CuckooFilter
import graft.url.Urls
import org.scalatest.funsuite.AnyFunSuite

class SeenSpec extends AnyFunSuite {

  test("cuckoo: no false negatives at 80% load") {
    val n = 20000
    val f = CuckooFilter.create(n)
    val keys = (0 until n).map(i => s"https://h$i.example.ir/Detail?IdeaId=$i")
    keys.foreach(k => f.insert(k))
    keys.foreach(k => assert(f.mightContain(k), k))
  }

  test("cuckoo: false positive rate within design bound") {
    val n = 20000
    val f = CuckooFilter.create(n)
    (0 until n).foreach(i => f.insert(s"in-$i"))
    val fp = (0 until 100000).count(i => f.mightContain(s"out-$i"))
    // design FPP ~1.2e-4; allow 10x slack → < 0.12%
    assert(fp < 120, s"fp=$fp")
  }

  test("cuckoo: delete removes without false negatives on others") {
    val f = CuckooFilter.create(1000)
    (0 until 1000).foreach(i => f.insert(s"k$i"))
    (0 until 500).foreach(i => assert(f.remove(s"k$i")))
    (500 until 1000).foreach(i => assert(f.mightContain(s"k$i")))
  }

  test("cuckoo: serialize/deserialize round-trip") {
    val f = CuckooFilter.create(5000)
    (0 until 5000).foreach(i => f.insert(s"url-$i"))
    val g = CuckooFilter.deserialize(f.serialize())
    (0 until 5000).foreach(i => assert(g.mightContain(s"url-$i")))
    assert(g.size == f.size)
  }

  test("cuckoo: merge preserves membership of both sides") {
    val a = CuckooFilter.create(4000)
    val b = CuckooFilter.create(4000)
    (0 until 2000).foreach(i => a.insert(s"a$i"))
    (0 until 2000).foreach(i => b.insert(s"b$i"))
    a.mergeFrom(b)
    (0 until 2000).foreach { i =>
      assert(a.mightContain(s"a$i")); assert(a.mightContain(s"b$i"))
    }
  }

  test("cuckoo: overflow past capacity keeps no-false-negative via stash") {
    val f = CuckooFilter.create(64) // tiny: 128 buckets? no — 8-ish buckets
    val keys = (0 until 2000).map(i => s"x$i")
    keys.foreach(k => f.insert(k))
    keys.foreach(k => assert(f.mightContain(k), k))
  }

  test("cuckoo: stashed keys are removable (retry re-admission past capacity)") {
    // overflow a tiny filter so some fingerprints live in the stash, then
    // delete EVERY key: a remove() that only scanned the two table buckets
    // left stashed keys 'seen' forever and desynchronized count
    val f = CuckooFilter.create(64)
    val keys = (0 until 2000).map(i => s"y$i")
    keys.foreach(k => f.insert(k))
    keys.foreach(k => assert(f.remove(k), s"unremovable: $k"))
    assert(f.size == 0, s"count desync: ${f.size}")
  }

  // --- URL canonicalization ---

  test("canonicalize: case, port, fragment, query sort") {
    assert(Urls.canonicalize("HTTPS://ExAmPle.IR:443/a/b?z=1&a=2#frag") ==
      "https://example.ir/a/b?a=2&z=1")
    assert(Urls.canonicalize("http://h.ir:80/") == "http://h.ir/")
    assert(Urls.canonicalize("http://h.ir") == "http://h.ir/")
  }

  test("canonicalize: dot segments and percent normalization") {
    assert(Urls.canonicalize("https://h.ir/a/./b/../c") == "https://h.ir/a/c")
    assert(Urls.canonicalize("https://h.ir/%7Euser/%2fx") == "https://h.ir/~user/%2Fx")
  }

  test("canonicalize is idempotent over a corpus") {
    val urls = Seq(
      "https://edarehoquqy.eadl.ir/API/Mvc/IdeaProject.IdeaSearch/CustomSearch/Search?pageIndex=3&pageSize=10",
      "HTTP://H0.Example.IR:80/a//b/../c?b=2&a=1#x",
      "https://h.ir/%D8%AC%D8%B3%D8%AA%D8%AC%D9%88?IdeaId=42",
      "https://h.ir/Detail?IdeaId=7&x=%41")
    urls.foreach { u =>
      val c = Urls.canonicalize(u)
      assert(Urls.canonicalize(c) == c, u)
    }
  }

  test("resolve: RFC 3986 §5.4 reference set (canonicalized where dots merge)") {
    val base = "http://a/b/c/d;p?q"
    assert(Urls.resolve(base, "g") == "http://a/b/c/g")
    assert(Urls.resolve(base, "g?y") == "http://a/b/c/g?y")
    assert(Urls.resolve(base, "/g") == "http://a/g")
    assert(Urls.resolve(base, "//g") == "http://g")
    assert(Urls.resolve(base, "?y") == "http://a/b/c/d;p?y")
    assert(Urls.resolve(base, "http://x/y") == "http://x/y")
    // dot segments are the canonicalizer's job — resolve merges, then
    // canonicalize(resolve(...)) lands on the RFC result
    assert(Urls.canonicalize(Urls.resolve(base, "./g")) == "http://a/b/c/g")
    assert(Urls.canonicalize(Urls.resolve(base, "../g")) == "http://a/b/g")
    assert(Urls.canonicalize(Urls.resolve(base, "../../g")) == "http://a/g")
    // excess ".." clamps at the root (RFC: ignored)
    assert(Urls.canonicalize(Urls.resolve(base, "../../../../g")) == "http://a/g")
  }

  test("resolve: crawl-specific divergences and edge cases") {
    val base = "http://a/b/c/d?q#oldfrag"
    // fragment-only keeps the base's path+query, drops ALL fragments
    // (the frontier keys pages, not in-page anchors)
    assert(Urls.resolve(base, "#s") == "http://a/b/c/d?q")
    assert(Urls.resolve(base, "") == "http://a/b/c/d?q")
    // opaque schemes return verbatim (AnchorText filters to http(s))
    assert(Urls.resolve(base, "mailto:x@y.z") == "mailto:x@y.z")
    assert(Urls.resolve(base, "javascript:void(0)") == "javascript:void(0)")
    // scheme-relative inherits the base scheme
    assert(Urls.resolve("https://h.ir/p", "//cdn.ir/x") == "https://cdn.ir/x")
    // base without a path: merge point is "/"
    assert(Urls.resolve("http://h.ir", "x") == "http://h.ir/x")
    assert(Urls.resolve("http://h.ir?q=1", "x") == "http://h.ir/x")
    // IPv6 authority survives the origin split
    assert(Urls.resolve("http://[::1]:8080/a/b", "x") == "http://[::1]:8080/a/x")
    // unus(e)able base + relative ref → "" (caller drops)
    assert(Urls.resolve("not a url", "x") == "")
    assert(Urls.resolve(null, "x") == "")
    assert(Urls.resolve("page?a=http://h.ir", "x") == "") // scheme-in-query is not a scheme
    // null/absolute ref against junk base still passes through
    assert(Urls.resolve("junk", "http://x/y") == "http://x/y")
    assert(Urls.resolve("http://a/b", null) == "http://a/b")
  }

  test("host extraction") {
    assert(Urls.host("https://h3.example.ir/x?y=1") == "h3.example.ir")
    assert(Urls.host("https://user@H.IR:8443/p") == "h.ir")
    assert(Urls.host("not a url") == "")
    // IPv6 literals keep their brackets (first-colon split returned "[",
    // collapsing every IPv6 site into one politeness bucket)
    assert(Urls.host("https://[2001:db8::1]/x") == "[2001:db8::1]")
    assert(Urls.host("https://[2001:db8::1]:8443/x") == "[2001:db8::1]")
  }

  test("canonicalize edge cases: degenerate query, dot-segment dirs, embedded absolute URL") {
    // all-empty param lists normalize to NO query — a bare '?' made
    // canonicalize non-idempotent (second pass stripped it → two keys for
    // one page)
    for (u <- Seq("http://h.ir/p?&", "http://h.ir/p?", "http://h.ir/p?&&")) {
      val c = Urls.canonicalize(u)
      assert(c == "http://h.ir/p", s"$u -> $c")
      assert(Urls.canonicalize(c) == c)
    }
    // RFC 3986 remove_dot_segments keeps the trailing slash for /. and /..
    // ("/a/" and "/a" are different resources on most servers)
    assert(Urls.canonicalize("https://h.ir/a/b/..") == "https://h.ir/a/")
    assert(Urls.canonicalize("https://h.ir/a/.") == "https://h.ir/a/")
    assert(Urls.canonicalize("https://h.ir/..") == "https://h.ir/")
    // a RELATIVE url carrying an absolute url in its query must take the
    // pass-through branch, not parse "page?a=http" as a scheme
    assert(Urls.canonicalize("page?a=http://h.ir&b=2") == "page?a=http://h.ir&b=2")
    // scheme chars are RFC ALPHA *(ALPHA/DIGIT/+/-/.)
    assert(Urls.canonicalize("ht+tp://h.ir/x") == "ht+tp://h.ir/x")
  }

  test("urlKey is stable sha256 of canonical form") {
    val k1 = Urls.urlKey("HTTPS://H.IR/a?b=1&a=2")
    val k2 = Urls.urlKey("https://h.ir/a?a=2&b=1")
    assert(k1 == k2)
    assert(k1.length == 64)
  }

  test("ideaId extraction (check_pages.py:151,162)") {
    assert(Urls.ideaId("https://h.ir/Detail?IdeaId=12345") == Some("12345"))
    assert(Urls.ideaId("https://h.ir/Detail") == None)
  }
}

package graft

import graft.ops.Urls
import org.scalatest.funsuite.AnyFunSuite

/** URL normalization / registered-domain closed cases — the edges the
  * synthetic q187 corpus cannot reach (unparseable inputs, IP
  * literals, bare hosts, odd ports). Lenient contract: a crawl URI
  * that does not parse normalizes to itself, never throws.
  */
class UrlsSpec extends AnyFunSuite {

  test("scheme and host lowercase; path case preserved") {
    assert(Urls.normalizeUrl("HTTP://WWW.Example.COM/Path/File") ===
      "http://www.example.com/Path/File")
  }

  test("default ports strip; explicit ports keep") {
    assert(Urls.normalizeUrl("http://a.com:80/x") === "http://a.com/x")
    assert(Urls.normalizeUrl("https://a.com:443/x") === "https://a.com/x")
    assert(Urls.normalizeUrl("http://a.com:443/x") === "http://a.com:443/x")
    assert(Urls.normalizeUrl("https://a.com:8080/x") === "https://a.com:8080/x")
  }

  test("fragment strips; query sorts; empty path becomes /") {
    assert(Urls.normalizeUrl("https://a.com#frag") === "https://a.com/")
    assert(Urls.normalizeUrl("https://a.com/p?z=1&a=2&m=3#f") ===
      "https://a.com/p?a=2&m=3&z=1")
    assert(Urls.normalizeUrl("https://a.com?b=2&a=1") === "https://a.com/?a=1&b=2")
    assert(Urls.normalizeUrl("https://a.com/p?") === "https://a.com/p")
  }

  test("unparseable inputs pass through unchanged") {
    assert(Urls.normalizeUrl("not a url") === "not a url")
    assert(Urls.normalizeUrl("mailto:x@y.com") === "mailto:x@y.com")
    assert(Urls.normalizeUrl("://nohost") === "://nohost")
    assert(Urls.normalizeUrl("") === "")
    assert(Urls.normalizeUrl(null) === null)
  }

  test("registered domain: plain, second-level suffix, bare, IP") {
    assert(Urls.registeredDomain("www.example.com") === "example.com")
    assert(Urls.registeredDomain("a.b.c.example.org") === "example.org")
    assert(Urls.registeredDomain("www.example.co.uk") === "example.co.uk")
    assert(Urls.registeredDomain("deep.sub.example.com.au") === "example.com.au")
    assert(Urls.registeredDomain("localhost") === "localhost")
    assert(Urls.registeredDomain("example.com") === "example.com")
    assert(Urls.registeredDomain("192.168.0.1") === "192.168.0.1")
    assert(Urls.registeredDomain("EXAMPLE.CO.UK") === "example.co.uk")
  }

  test("hostOf strips port and lowercases") {
    assert(Urls.hostOf("HTTPS://A.Com:8080/x") === "a.com")
    assert(Urls.hostOf("junk") === "")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls

/** Unit cases for the URL canonicalizer behind q127: every rule
  * fires, no rule over-merges, and the function is idempotent (a
  * canonical form is its own canonical form — required for safe
  * re-runs over an already-normalized crawl store).
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .as[String].collect().toSeq

  test("case, default port, www, fragment, utm, param order, trailing slash") {
    val got = canon(
      "HTTPS://WWW.Example.com:443/a/?b=2&a=1&utm_source=feed#top",
      "https://example.com/a?a=1&b=2",
      "http://news.site.org:80/x/y/?utm_campaign=z#frag",
      "http://news.site.org/x/y")
    assert(got(0) == "https://example.com/a?a=1&b=2")
    assert(got(0) == got(1))
    assert(got(2) == "http://news.site.org/x/y")
    assert(got(2) == got(3))
  }

  test("non-default port, scheme, host, path, param VALUES are preserved") {
    val got = canon(
      "https://example.com:8443/a?a=1",  // non-default port stays
      "http://example.com/a?a=1",        // http != https
      "https://example.org/a?a=1",       // different host
      "https://example.com/b?a=1",       // different path
      "https://example.com/a?a=2")       // different value
    assert(got.distinct.size == 5, s"over-merged: $got")
    assert(got(0) == "https://example.com:8443/a?a=1")
  }

  test("canonicalization is idempotent") {
    val raw = Seq(
      "HTTPS://WWW.Example.com:443/a/?b=2&a=1&utm_source=feed#top",
      "http://x.y:80/?utm_a=1&utm_b=2",
      "https://example.com")
    val once = canon(raw: _*)
    val twice = canon(once: _*)
    assert(once == twice, s"$once vs $twice")
  }

  test("all-utm query drops the '?' entirely; bare host gets empty path") {
    val got = canon(
      "http://x.y/?utm_a=1&utm_b=2",
      "https://example.com",
      "https://example.com/")
    assert(got(0) == "http://x.y")
    assert(got(1) == "https://example.com" && got(2) == got(1))
  }

  test("malformed input degrades to a '://'-prefixed sentinel, no error") {
    val got = canon("not a url", "")
    assert(got.forall(_ == "://"), s"got $got")
  }

  test(":80/:443 only default for http/https — other schemes keep ports") {
    val got = canon(
      "ftp://host:80/x",    // :80 is NOT ftp's default — must survive
      "ftp://host/x",
      "gopher://host:443/y",
      "ws://host:80/z")     // ws default is 80 but we only rule on http(s)
    assert(got(0) == "ftp://host:80/x", s"got ${got(0)}")
    assert(got(1) == "ftp://host/x")
    assert(got(0) != got(1), "ftp :80 conflated with portless")
    assert(got(2) == "gopher://host:443/y")
    assert(got(3) == "ws://host:80/z")
  }
}

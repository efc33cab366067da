package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization fixtures: every normalization arm on hand-written
  * URLs, idempotence (a canonical URL re-canonicalizes to itself), and the
  * degenerate non-URL inputs a crawl column actually contains.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(us: String*): Seq[String] =
    us.toDF("u").select(UrlFunctions.normalizeUrl($"u")).as[String].collect().toSeq

  test("normalizeUrl: case, default ports, slashes, query, fragment") {
    assert(norm("HTTPS://WWW.Ex.COM:443/A//b///c/?utm_source=x#f")
      == Seq("https://www.ex.com/A/b/c"))
    assert(norm("http://ex.com:80/") == Seq("http://ex.com"))
    assert(norm("http://ex.com:8080/p/") == Seq("http://ex.com:8080/p"),
      "non-default port survives")
    assert(norm("https://ex.com") == Seq("https://ex.com"), "no path at all")
    assert(norm("not a url") == Seq(""), "garbage -> empty, never a throw")
    // path case is preserved — only scheme+host fold (URLs are case-
    // sensitive past the authority)
    assert(norm("https://EX.com/Path/File") == Seq("https://ex.com/Path/File"))
  }

  test("normalizeUrl is idempotent on its own output") {
    val raw = Seq("HTTPS://WWW.Ex.COM:443/A//b/?q=1#f", "http://h.io/x/", "https://h.net")
    val once = norm(raw: _*)
    assert(norm(once: _*) == once)
  }

  test("urlHost / urlTld: www strip, port strip, dotless host") {
    val got = Seq("HTTP://WWW.News.Ex.CO.uk:8080/p?q", "https://localhost/x")
      .toDF("u")
      .select(UrlFunctions.urlHost($"u").as("h"),
        UrlFunctions.urlTld(UrlFunctions.urlHost($"u")).as("t"))
      .as[(String, String)].collect()
    assert(got(0) == (("news.ex.co.uk", "uk")))
    assert(got(1) == (("localhost", "")), "dotless host has no tld")
  }

  test("pathDepth counts normalized segments; trackingParamCount counts raw params") {
    val got = Seq(
      ("https://h.io", 0L, 0L),
      ("https://h.io/", 0L, 0L),
      ("https://h.io/a//b/c/?utm_source=x&gclid=1&id=2", 3L, 2L),
      ("https://h.io/a?fbclid=z&utm_campaign=c&utm_x=1", 1L, 3L))
      .toDF("u", "d", "t")
    val bad = got.filter(
      UrlFunctions.pathDepth($"u") =!= $"d" ||
        UrlFunctions.trackingParamCount($"u") =!= $"t")
    assert(bad.count() == 0)
  }
}

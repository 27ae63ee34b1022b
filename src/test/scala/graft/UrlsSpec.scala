package graft

import org.apache.spark.sql.functions._

import graft.ops.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(Tuple1(url)).toDF("url")
      .select(Urls.canonicalizeUrl($"url")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("scheme and host lowercase; default port drops; path defaults to /") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b") ==
      "https://www.example.com/A/b")
    assert(canon("http://Ex.org:80") == "http://ex.org/")
    assert(canon("http://ex.org") == "http://ex.org/")
  }

  test("non-default port kept; path case preserved") {
    assert(canon("http://ex.org:8080/Api/V1") == "http://ex.org:8080/Api/V1")
    assert(canon("https://ex.org:80/x") == "https://ex.org:80/x")
  }

  test("tracking params drop, survivors keep original order, fragment drops") {
    assert(canon("https://ex.org/p?utm_source=a&b=2&gclid=x&a=1#frag") ==
      "https://ex.org/p?b=2&a=1")
    assert(canon("https://ex.org/p?utm_campaign=only#f") == "https://ex.org/p")
    assert(canon("https://ex.org/p?fbclid=z") == "https://ex.org/p")
  }

  test("malformed URLs canonicalize to NULL, not pass-through") {
    assert(canon("not a url") == null)
    assert(canon("www.ex.org/no-scheme") == null)
  }

  test("registrable domain is the last two host labels") {
    val out = Seq("www.news.example.co", "example.com", "localhost")
      .toDF("h").select(Urls.registrableDomain($"h")).collect()
      .map(_.getString(0))
    assert(out.toSeq == Seq("example.co", "example.com", ""))
  }

  test("filterBlockedDomains drops blocked registrable domains only") {
    val df = Seq(
      (1L, "https://www.spam.example.com/x"),
      (2L, "https://ok.example.org/y"),
      (3L, "http://sub.deep.spam.example.com/z"),
      (4L, "https://EXAMPLE.COM/u")).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url",
        Seq("Example.com")).select("id")
      .collect().map(_.getLong(0)).sorted
    // 1, 3, 4 all blocked: their hosts end in example.com (last two
    // labels), case-insensitively on both sides; example.org survives
    assert(kept.toSeq == Seq(2L))
  }

  test("canonicalization is a fixed point: canon(canon(u)) == canon(u)") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/A/b?utm_source=x&q=1#f",
      "http://Ex.org:8080", "https://a.b.c.net/p?x=1&y=2",
      "ftp://Files.EX.com:21/pub").toDF("url")
    val once = urls.select(Urls.canonicalizeUrl($"url").as("c"))
    val twice = once.select(Urls.canonicalizeUrl($"c").as("c2"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
  }

  test("dedupByCanonicalUrl collapses canonical twins, keeps unparseable rows") {
    val df = Seq(
      (1L, "https://ex.org/p?utm_source=a"),
      (2L, "HTTPS://EX.ORG:443/p#frag"),
      (3L, "https://ex.org/q"),
      (4L, "garbage"),
      (5L, "also garbage")).toDF("id", "url")
    val out = Urls.dedupByCanonicalUrl(df, "id", "url")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "https://ex.org/p", 2L),
      (3L, "https://ex.org/q", 1L),
      (4L, null, 1L),
      (5L, null, 1L)))
  }
}

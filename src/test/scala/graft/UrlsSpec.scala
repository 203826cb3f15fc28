package graft

import graft.ops.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Map[String, (String, String)] = {
    import spark.implicits._
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    Urls.canonicalize(df).collect()
      .map(r => urls(r.getLong(0).toInt) -> ((r.getString(2), r.getString(3)))).toMap
  }

  test("canonicalize: case, www, default port, fragment, tracking params, param order") {
    val got = canon(
      "HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=2&id=1&ref=t#frag",
      "http://example.com:80/p",
      "https://news.site.org/x?b=2&a=1",
      "https://example.com/q?utm_campaign=c&utm_medium=m",
      "https://sub.domain.example.co/path")
    assert(got("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&z=2&id=1&ref=t#frag") ==
      (("https://example.com/a/b?id=1&z=2", "example.com")))
    assert(got("http://example.com:80/p") == (("http://example.com/p", "example.com")))
    assert(got("https://news.site.org/x?b=2&a=1") ==
      (("https://news.site.org/x?a=1&b=2", "site.org")))
    // all params tracking -> no '?' at all
    assert(got("https://example.com/q?utm_campaign=c&utm_medium=m") ==
      (("https://example.com/q", "example.com")))
    assert(got("https://sub.domain.example.co/path") ==
      (("https://sub.domain.example.co/path", "example.co")))
  }

  test("canonicalize keeps non-default ports and bare hosts") {
    val got = canon(
      "http://dev.example.com:8080/api?x=1",
      "https://example.com",
      "https://www.example.com/")
    assert(got("http://dev.example.com:8080/api?x=1") ==
      (("http://dev.example.com:8080/api?x=1", "example.com")))
    assert(got("https://example.com") == (("https://example.com", "example.com")))
    assert(got("https://www.example.com/") == (("https://example.com/", "example.com")))
  }

  test("syntheticUrls canonicalize to the independently constructed form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Urls.canonicalize(Urls.syntheticUrls(docs))
      .select(col("doc_id"), col("url_canon"), col("domain"))
    val expected = docs.select(col("doc_id"),
      concat(lit("https://"), lower(col("source")), lit(".example.com/p/"), col("doc_id"),
        lit("?id="), col("doc_id"), lit("&z="), pmod(col("doc_id"), lit(7))).as("url_canon"),
      lit("example.com").as("domain"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}

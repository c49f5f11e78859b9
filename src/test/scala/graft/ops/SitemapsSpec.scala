package graft.ops

import graft.SparkSpec

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("sitemapUrls: loc/lastmod subset, entity decode, whitespace/case tolerance, loc-less entries dropped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> http://a.com/p?x=1&amp;y=2 </loc>
        |    <lastmod>2026-08-01</lastmod>
        |  </url>
        |  <URL><LOC>http://a.com/q</LOC></URL>
        |  <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val got = Sitemaps.sitemapUrls(Seq(("a.com", xml))
        .toDF("domain", "sitemap_xml"))
      .orderBy("loc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("a.com", "http://a.com/p?x=1&y=2", "2026-08-01"),
      ("a.com", "http://a.com/q", "")))
    // the index form: child sitemaps, same subset
    val idx =
      """<sitemapindex>
        |  <sitemap><loc>http://a.com/sitemap-1.xml</loc>
        |    <lastmod>2026-07-01</lastmod></sitemap>
        |  <sitemap><loc>http://a.com/sitemap-2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val kids = Sitemaps.sitemapIndex(Seq(("a.com", idx))
        .toDF("domain", "sitemap_xml"))
      .orderBy("loc").collect().map(r => (r.getString(1), r.getString(2)))
    assert(kids.toSeq === Seq(
      ("http://a.com/sitemap-1.xml", "2026-07-01"),
      ("http://a.com/sitemap-2.xml.gz", "")))
    // a urlset parsed as an index (and vice versa) yields nothing —
    // the two entry kinds never cross-match... <sitemap> does not
    // match inside <sitemapindex>'s own tag
    assert(Sitemaps.sitemapIndex(Seq(("a.com", xml))
      .toDF("domain", "sitemap_xml")).count() === 0)
    assert(Sitemaps.sitemapUrls(Seq(("a.com", idx))
      .toDF("domain", "sitemap_xml")).count() === 0)
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalize(col("u"))).head().getString(0)
  private def dom(u: String): String =
    Seq(u).toDF("u").select(Urls.domain(col("u"))).head().getString(0)

  test("normalize: each documented rule, one at a time, and all together") {
    // fragment dropped
    assert(norm("http://a.com/p#frag") === "http://a.com/p")
    // scheme+authority lowercased; path/query case KEPT
    assert(norm("HTTPS://WWW.Ex.COM/Path?Q=Mixed") ===
      "https://www.ex.com/Path?Q=Mixed")
    // userinfo dropped
    assert(norm("http://user:pw@a.com/p") === "http://a.com/p")
    // default ports dropped — SCHEME-relatively: :80 only under http,
    // :443 only under https; the cross pairs are distinct origins and
    // stay verbatim (merging them would over-merge the dedup key)
    assert(norm("http://a.com:80/p") === "http://a.com/p")
    assert(norm("https://a.com:443/p") === "https://a.com/p")
    assert(norm("https://a.com:80/p") === "https://a.com:80/p")
    assert(norm("http://a.com:443/p") === "http://a.com:443/p")
    assert(norm("http://a.com:8080/p") === "http://a.com:8080/p")
    // bare-host trailing slash dropped; a real path keeps its slash
    assert(norm("http://a.com/") === "http://a.com")
    assert(norm("http://a.com/p/") === "http://a.com/p/")
    // all together
    assert(norm("HTTP://bob@WWW.A.com:80/Keep/Case?x=Y#z") ===
      "http://www.a.com/Keep/Case?x=Y")
    // not a hierarchical URL: verbatim (minus nothing)
    assert(norm("not a url at all") === "not a url at all")
  }

  test("domain: host lowercased, www./port/userinfo/path stripped") {
    assert(dom("HTTPS://WWW.Sub.Example.COM:8443/p?q#f") === "sub.example.com")
    assert(dom("http://bob@news.site.org/x") === "news.site.org")
    assert(dom("http://plain.io") === "plain.io")
  }

  test("urlDedup keeps the minimum id per NORMALIZED url; urlFront caps per domain deterministically") {
    val df = Seq(
      (1L, "http://a.com/p"),
      (2L, "HTTP://A.com:80/p#x"),   // same page after normalization
      (3L, "http://a.com/q"),
      (4L, "http://b.com/p"),
      (5L, "http://www.b.com/p")     // different NORMALIZED url (www kept)
    ).toDF("doc_id", "url")
    val kept = Urls.urlDedup(df, "url").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
    // cap = 1 per domain: b.com and www.b.com share the DOMAIN label,
    // so exactly one of (4, 5) survives; a.com keeps one of (1, 3)
    val front = Urls.urlFront(df, "url", maxPerDomain = 1)
      .select("doc_id", "domain").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(front.length === 2)
    assert(front.map(_._2).toSet === Set("a.com", "b.com"))
    // deterministic: the same call returns the same rows
    val again = Urls.urlFront(df, "url", maxPerDomain = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === front.map(_._1).toSet)
  }
}

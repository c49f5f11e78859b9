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

  private def reg(u: String): String =
    Seq(u).toDF("u").select(Urls.registrableDomain(col("u"))).head().getString(0)

  test("registrableDomain: eTLD+1 under the bounded multi-label suffix subset") {
    assert(reg("http://www.example.com/p") === "example.com")
    assert(reg("https://blog.shop.example.com/x") === "example.com")
    assert(reg("http://a.b.site.co.uk/") === "site.co.uk")
    assert(reg("http://site.co.uk") === "site.co.uk")
    // the suffix itself (2 labels) registers as itself
    assert(reg("http://co.uk") === "co.uk")
    assert(reg("http://localhost:8080/x") === "localhost")
    // case/userinfo/port stripped before the label split
    assert(reg("HTTP://User@WWW.Site.COM.AU:80/p#f") === "site.com.au")
    // a multi-label string NOT in the subset registers at two labels
    assert(reg("http://www.site.co.zz/") === "co.zz")
  }

  test("withRegistrableDomain: suffix relation decides; embedded-subset parity") {
    val df = Seq(
      (1L, "http://www.example.com/p"),
      (2L, "http://a.b.site.co.uk/"),
      (3L, "http://deep.corp.web.zz/x"), // suffix only in the relation
      (4L, "http://plain.zz/y"),
      (5L, "http://localhost/z")
    ).toDF("doc_id", "url")
    // a relation with a suffix the embedded subset does NOT know
    val sfx = Seq("co.uk", "web.zz").toDF("suffix")
    val got = Urls.withRegistrableDomain(df, "url", sfx)
      .select("doc_id", "registrable_domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "example.com", 2L -> "site.co.uk",
      3L -> "corp.web.zz", 4L -> "plain.zz", 5L -> "localhost"))
    // parity: the embedded subset AS a relation reproduces the column
    // form exactly
    val subsetRel = Urls.MultiLabelSuffixes.toDF("suffix")
    val viaRel = Urls.withRegistrableDomain(df, "url", subsetRel)
      .select("doc_id", "registrable_domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCol = df.select(col("doc_id"),
        Urls.registrableDomain(col("url")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaRel === viaCol)
  }

  test("blocklistFilter drops host and registrable families; urlFront caps per registrable domain") {
    val df = Seq(
      (1L, "http://www.bad.com/a"),
      (2L, "http://tracker.bad.com/b"),   // registrable-level block
      (3L, "http://good.com/a"),
      (4L, "http://blog.good.co.uk/x"),
      (5L, "http://www.good.co.uk/y"),
      (6L, "http://shop.good.co.uk/z"),
      (7L, "http://ads.good.com/t")       // host-level block only
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.com", "ads.good.com").toDF("domain")
    val kept = Urls.blocklistFilter(df, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // bad.com kills 1 (host match after www-strip) and 2 (registrable);
    // ads.good.com kills 7 at host level but NOT good.com itself
    assert(kept === Set(3L, 4L, 5L, 6L))
    // the shuffled anti-join form is decision-identical
    val kept2 = Urls.blocklistFilter(df, "url", blocked,
      broadcastList = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
    // per-registrable cap: the three good.co.uk HOSTS share ONE budget
    val front = Urls.urlFront(df, "url", maxPerDomain = 2,
      blocklist = Some(blocked), capPerRegistrable = true)
    val regs = front.select("registrable_domain").collect()
      .map(_.getString(0))
    assert(regs.count(_ == "good.co.uk") === 2)
    assert(regs.count(_ == "good.com") === 1)
    assert(!regs.contains("bad.com"))
  }

  test("crawlFrontier: gates compose, slots sequence per domain, rankless hosts read priority 0") {
    val urls = Seq(
      (1L, "http://a.com/x/1"), (2L, "http://a.com/x/2"),
      (3L, "http://a.com/x/3"),
      (4L, "http://a.com/private/4"),     // robots-blocked
      (5L, "http://bad.com/x/5"),         // blocklisted
      (6L, "http://norank.com/x/6")       // absent from the rank relation
    ).toDF("doc_id", "url")
    val rules = Seq(("a.com", "/private")).toDF("domain", "path_prefix")
    val blocked = Seq("bad.com").toDF("domain")
    val ranks = Seq(("a.com", 777000L)).toDF("domain", "rank_micro")
    val out = Urls.crawlFrontier(urls, rules, blocked, ranks,
        maxPerDomain = 2)
      .select("doc_id", "domain", "rank_micro", "fetch_slot").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // a.com: 2 of {1,2,3} survive the cap with slots 1..2; norank.com
    // keeps its row at priority 0, slot 1
    val byDomain = out.groupBy(_._2)
    assert(byDomain("a.com").map(_._4).sorted.toSeq === Seq(1, 2))
    assert(byDomain("a.com").forall(_._3 == 777000L))
    assert(byDomain("norank.com").toSeq.map(t => (t._3, t._4)) ===
      Seq((0L, 1)))
    assert(!out.exists(r => r._1 == 4L || r._1 == 5L))
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

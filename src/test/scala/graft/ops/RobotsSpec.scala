package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("disallowRules: RFC grouping, agent binding, comments/blank lines, case-insensitive fields") {
    val robots = Seq(
      ("a.com",
        "# comment line\n" +
          "User-agent: *\n" +
          "Disallow: /private\n" +
          "Disallow: /tmp/ # trailing comment\n" +
          "\n" +
          "User-agent: badbot\n" +
          "User-agent: otherbot\n" +      // consecutive UA lines share
          "DISALLOW: /everything\n" +     // case-insensitive field
          "Disallow:\n"),                 // empty value = allow-all, no rule
      ("b.com",
        "User-agent: goodbot\n" +
          "Disallow: /only-goodbot\n")
    ).toDF("domain", "robots_txt")
    val star = Robots.disallowRules(robots)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // '*' sees only the wildcard group on a.com; b.com binds nothing
    assert(star === Set(("a.com", "/private"), ("a.com", "/tmp/")))
    val bad = Robots.disallowRules(robots, agent = "BadBot")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // badbot: its own group (shared via the consecutive-UA rule) PLUS
    // the wildcard group
    assert(bad === Set(("a.com", "/private"), ("a.com", "/tmp/"),
      ("a.com", "/everything")))
    val good = Robots.disallowRules(robots, agent = "goodbot")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(good === Set(("a.com", "/private"), ("a.com", "/tmp/"),
      ("b.com", "/only-goodbot")))
  }

  test("robotsGate: prefix semantics, pathless URLs, www-stripped domain keying, query matched, fragment not") {
    val rules = Seq(("a.com", "/private"), ("a.com", "/x?q="),
      ("b.com", "/")).toDF("domain", "path_prefix")
    val urls = Seq(
      (1L, "http://a.com/private/doc"),   // blocked: prefix
      (2L, "http://a.com/privateer"),     // blocked: PREFIX semantics
      (3L, "http://WWW.A.com/public"),    // kept; www strips for the key
      (4L, "http://a.com"),               // pathless = '/', kept on a.com
      (5L, "http://b.com"),               // pathless = '/', blocked on b.com
      (6L, "http://a.com/x?q=1"),         // blocked: query is matchable
      (7L, "http://a.com/ok#/private")    // kept: fragment is NOT the path
    ).toDF("doc_id", "url")
    val kept = Robots.robotsGate(urls, rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L, 7L))
  }
}

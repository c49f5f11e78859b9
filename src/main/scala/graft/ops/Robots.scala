package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL gating — the crawl-politeness stage
  * (RFC 9309; RefinedWeb and every responsible crawl respect it
  * before fetching): a robots file is line-oriented groups — one or
  * more consecutive `User-agent` lines naming who the group binds,
  * then `Disallow` path prefixes — and a URL is blocked for an agent
  * when any binding group disallows a prefix of its path.
  *
  * DOCUMENTED SUBSET (the oracle-portable core; each is an extension,
  * not a redesign): `Disallow` prefix rules only (`Allow`
  * longest-match override, `*`/`$` wildcards, and `Crawl-delay` are
  * outside the subset); group membership is the RFC rule that
  * CONSECUTIVE `User-agent` lines share the following rules;
  * comments (`#…`) and blank lines are ignored; field names are
  * case-insensitive; an empty `Disallow:` value (allow-all) emits no
  * rule.
  *
  * Scale shape: parsing is one posexplode + one per-domain window
  * (bounded by a robots file's line count — KBs); the gate is an
  * anti-join equi-keyed on the domain with the prefix test as a
  * residual condition — rules per domain are tiny, so the join is
  * broadcast-able when the rule relation is and hash-keyed otherwise;
  * no nested loop either way. */
object Robots {

  /** Parse (domain, robots_txt) rows into per-domain disallow rules
    * binding `agent` (its section named `agent` or `*`). Output:
    * (domain, path_prefix) — one row per applicable Disallow line. */
  def disallowRules(robots: DataFrame, agent: String = "*",
                    domainCol: String = "domain",
                    txtCol: String = "robots_txt"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(regexp_replace(col(txtCol), "\r", ""), "\n"))
          .as(Seq("pos", "raw")))
      .select(col("domain"), col("pos"),
        trim(substring_index(col("raw"), "#", 1)).as("line"))
      .withColumn("kind",
        lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        when(instr(col("line"), ":") > 0,
          trim(col("line").substr(instr(col("line"), ":") + lit(1),
            length(col("line")))))
          .otherwise(lit("")))
      .withColumn("isUa", col("kind") === "user-agent")
    // RFC 9309 grouping: a User-agent line OPENS a new group unless
    // the previous line was also one (consecutive UA lines share the
    // group). The window is per-domain over the file's line count.
    val w = Window.partitionBy("domain").orderBy("pos")
    val grouped = lines
      .withColumn("prevUa",
        coalesce(lag(col("isUa"), 1).over(w), lit(false)))
      .withColumn("g", sum(when(col("isUa") && !col("prevUa"), 1L)
        .otherwise(0L)).over(w))
    val agents = grouped.where(col("isUa"))
      .groupBy("domain", "g")
      .agg(collect_set(lower(col("value"))).as("agents"))
    grouped
      .where(col("kind") === "disallow" && col("value") =!= "")
      .select(col("domain"), col("g"), col("value").as("path_prefix"))
      .join(agents, Seq("domain", "g"))
      .where(array_contains(col("agents"), "*") ||
        array_contains(col("agents"), agent.toLowerCase))
      .select("domain", "path_prefix").distinct()
  }

  /** Drop every URL some applicable rule disallows: anti-join
    * equi-keyed on the URL's domain ([[Urls.domain]] — www-stripped,
    * matching how the rules relation is keyed by its caller) with the
    * path-prefix test as the residual condition. The URL's path is
    * everything from the first `/` after the authority (query
    * included, fragment dropped — robots paths match the request
    * target); a URL with no path is `/`. */
  def robotsGate(urls: DataFrame, rules: DataFrame,
                 urlCol: String = "url"): DataFrame = {
    val noFrag = substring_index(col(urlCol), "#", 1)
    val path = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*(/[^#]*)", 1)
    val withKey = urls
      .withColumn("__dom", Urls.domain(col(urlCol)))
      .withColumn("__path",
        when(path === "", lit("/")).otherwise(path))
    withKey.join(rules,
        withKey("__dom") === rules("domain") &&
          withKey("__path").startsWith(rules("path_prefix")),
        "left_anti")
      .drop("__dom", "__path")
  }
}

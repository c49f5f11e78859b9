package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemap.xml parsing — the DISCOVERY side of the pre-fetch stage
  * ([[Robots]] says what not to fetch; sitemaps say what exists):
  * a sitemaps.org urlset is `<url>` entries carrying a mandatory
  * `<loc>` and optional metadata, and a sitemap INDEX is `<sitemap>`
  * entries pointing at child sitemaps — both parsed here, feeding
  * [[UrlIndex]]/[[Urls.crawlFrontier]] as candidate URL relations.
  *
  * DOCUMENTED SUBSET (oracle-portable, covers the format the spec
  * actually mandates): `<url>`/`<sitemap>` blocks with `<loc>` and
  * optional `<lastmod>`, tags whitespace- and case-tolerant, values
  * trimmed, the five XML entities decoded (they are in the engine's
  * named entity set — `&amp;` last, the one-pass contract); CDATA
  * sections and extension namespaces (image/video/news) are outside
  * the subset. Entries without a `<loc>` are dropped (a sitemap row
  * without a URL designates nothing).
  *
  * Scale shape: one posexplode over the block matches — scan-local,
  * no shuffle; a 50k-URL sitemap (the spec's own cap) is one row in,
  * 50k rows out. */
object Sitemaps {

  private def entries(df: DataFrame, xmlCol: String, block: String,
                      keep: Seq[org.apache.spark.sql.Column]) = {
    val pat = s"(?is)<$block\\b[^>]*>(.*?)</$block>"
    val loc = trim(graft.functions.EntityExpressions.decode_html_entities(
      regexp_extract(col("__e"), "(?is)<loc\\s*>(.*?)</loc>", 1)))
    val lastmod = trim(regexp_extract(col("__e"),
      "(?is)<lastmod\\s*>(.*?)</lastmod>", 1))
    df.select(keep :+ posexplode(
        regexp_extract_all(col(xmlCol), lit(pat), lit(1)))
        .as(Seq("__i", "__e")): _*)
      .select(keep :+ loc.as("loc") :+ lastmod.as("lastmod"): _*)
      .where(col("loc") =!= "")
  }

  /** One row per `<url>` entry of a urlset: (the `keyCols` carried
    * through, loc, lastmod — '' when absent). */
  def sitemapUrls(sitemaps: DataFrame, xmlCol: String = "sitemap_xml",
                  keyCols: Seq[String] = Seq("domain")): DataFrame =
    entries(sitemaps, xmlCol, "url", keyCols.map(col))

  /** One row per `<sitemap>` entry of a sitemap INDEX — the child
    * sitemaps a crawler fetches next (same columns as
    * [[sitemapUrls]]). */
  def sitemapIndex(sitemaps: DataFrame, xmlCol: String = "sitemap_xml",
                   keyCols: Seq[String] = Seq("domain")): DataFrame =
    entries(sitemaps, xmlCol, "sitemap", keyCols.map(col))
}

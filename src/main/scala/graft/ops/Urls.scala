package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The URL stage of a crawl pipeline — the dedup/cap pass that runs
  * BEFORE any content is read (CCNet dedups by URL across dumps;
  * RefinedWeb caps documents per domain and gates on blocklists):
  * everything here is a scan-local projection over the URI column plus
  * the engine's existing deterministic cap, so at 100 TB the stage
  * prices as one scan + one url-keyed exchange.
  *
  * Normalization contract (DOCUMENTED SUBSET of RFC 3986, mirrored
  * verbatim in the DuckDB oracle — full normalization needs a URL
  * parser and buys little for dedup):
  *  1. drop the fragment (`#…` never reaches the server),
  *  2. lowercase the scheme and authority (case-insensitive by spec;
  *     path/query stay case-SENSITIVE),
  *  3. drop userinfo (`user@`) and the SCHEME'S default port — `:80`
  *     under `http`, `:443` under `https` only (RFC 3986 default-port
  *     elision is scheme-relative: `https://a.com:80` is a distinct
  *     origin and stays verbatim),
  *  4. drop a trailing `/` on a bare-host URL (`http://a.com/` ≡
  *     `http://a.com`).
  * The registrable-domain label additionally strips a leading `www.`.
  */
object Urls {

  /** Normalized URL (see contract above) — the dedup key. */
  def normalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    // scheme://userinfo@host:port — everything before the first
    // path/query delimiter
    val schemeAuth = regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?]*)", 1)
    val rest = noFrag.substr(length(schemeAuth) + 1, length(noFrag))
    // scheme-conditional default-port elision: :80 only under http,
    // :443 only under https — any other (scheme, port) pair is a
    // distinct origin and must not merge under the dedup key
    val canonAuth = regexp_replace(
      regexp_replace(
        regexp_replace(lower(schemeAuth), "://[^/@]*@", "://"),
        "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    when(schemeAuth === "", noFrag) // not a hierarchical URL: verbatim
      .otherwise(concat(canonAuth,
        when(rest === "/", lit("")).otherwise(rest)))
  }

  /** The domain label (host, lowercased, `www.` stripped) — the cap /
    * blocklist key. */
  def domain(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url),
        "^[a-z][a-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1),
      "^www\\.", "")

  /** URL-level dedup: one row per normalized URL, the minimum id kept
    * (the CCNet cross-dump rule — the same page fetched twice is the
    * same page). One exchange keyed on the normalized url. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String = "doc_id"): DataFrame = {
    val keep = df
      .select(normalize(col(urlCol)).as("url_norm"), col(idCol))
      .groupBy("url_norm").agg(min(col(idCol)).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** The composed URL front: normalize → URL dedup → domain label →
    * deterministic per-domain cap ([[Sampling.capPerKey]] — the
    * RefinedWeb "at most N pages per domain" knob, stable-hash draw so
    * no crawl-order bias survives). Output: the kept rows plus
    * `url_norm` and `domain`. */
  def urlFront(df: DataFrame, urlCol: String, idCol: String = "doc_id",
               maxPerDomain: Int = 1000, salt: String = "cap"): DataFrame = {
    val deduped = urlDedup(df, urlCol, idCol)
      .withColumn("url_norm", normalize(col(urlCol)))
      .withColumn("domain", domain(col(urlCol)))
    Sampling.capPerKey(deduped, col("domain"), col(idCol), maxPerDomain, salt)
  }
}

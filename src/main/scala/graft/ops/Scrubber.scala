package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / noise scrubbing for pretraining text: redact emails, URLs, and
  * long digit runs (account/phone/ID-shaped tokens) with typed
  * placeholder tokens, and count what was redacted — the standard
  * "scrub before you train" pass of a web-corpus pipeline.
  *
  * Patterns deliberately use only the regex subset with identical
  * semantics in Java (Spark codegen'd regexp_replace/regexp_count) and
  * RE2 (DuckDB oracle): character classes, bounded/unbounded
  * quantifiers — no backrefs, no lookaround. Replacement order is
  * load-bearing and mirrored in the oracle: URLs first (a URL may
  * contain @ or digit runs), then emails, then digit runs.
  *
  * Scale: pure scan-local projection — no shuffle, no UDF; the regexes
  * run inside whole-stage codegen like any other string expression. */
object Scrubber {

  val UrlPat = "https?://[^\\s]+"
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitsPat = "[0-9]{9,}"

  /** Redacted text column. */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPat, "<URL>"),
        EmailPat, "<EMAIL>"),
      LongDigitsPat, "<ID>")

  /** Per-document scrub result: redacted text plus counts of each
    * redacted category (counted on the original text, pre-redaction). */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      scrubText(col(textCol)).as("clean_text"),
      regexp_count(col(textCol), lit(UrlPat)).cast("long").as("n_urls"),
      regexp_count(regexp_replace(col(textCol), UrlPat, "<URL>"), lit(EmailPat))
        .cast("long").as("n_emails"),
      regexp_count(
        regexp_replace(regexp_replace(col(textCol), UrlPat, "<URL>"),
          EmailPat, "<EMAIL>"),
        lit(LongDigitsPat)).cast("long").as("n_ids"))
}

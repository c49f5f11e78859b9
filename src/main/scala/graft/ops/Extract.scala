package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → main-text extraction: the FIRST stage of a raw-crawl
  * pipeline (the CCNet/trafilatura step every Common-Crawl user runs
  * before any operator downstream of it). Stages, in load-bearing
  * order:
  *
  *  1. drop `<script>…</script>` and `<style>…</style>` WITH their
  *     content (code and CSS are not text),
  *  2. drop `<!-- … -->` comments,
  *  3. replace block-structure tags (`p div h1…h6 li ul ol tr td th
  *     table section article header footer nav blockquote pre form
  *     br`) with a newline — the document's visual line structure is
  *     what the boilerplate heuristic sees,
  *  4. strip every remaining (inline) tag,
  *  5. decode HTML entities — the full named set plus decimal and hex
  *     numeric references across the Unicode range (see
  *     [[graft.functions.EntityExpressions]]), with `&amp;` LAST so
  *     `&amp;lt;` correctly yields the literal `&lt;`,
  *  6. line-level boilerplate cut: split on newlines, trim, keep lines
  *     with ≥ `minWords` space-separated tokens and at least one
  *     letter (nav crumbs, button labels, and bare headings go; prose
  *     survives) — the CCNet line-filter shape.
  *
  * Everything is a scan-local projection — regex replaces, plain
  * `replace`, and higher-order array functions; no UDF, no shuffle —
  * so at 100 TB it runs at scan speed and composes in front of any
  * chain (q146 proves it in front of the full curation pipeline).
  * Patterns use only the regex subset with identical semantics in
  * Java (Spark) and RE2 (DuckDB oracle): inline `(?is)` flags,
  * non-greedy quantifiers, character classes — no backrefs, no
  * lookaround (RE2 has none; the block-tag pattern uses an explicit
  * `(\s[^>]*)?/?>` attribute tail instead of a word-boundary
  * lookahead so `<param>` is NOT mistaken for `<p…>`).
  *
  * Idempotence caveat (spec-asserted both ways): extraction is
  * idempotent on its own output EXCEPT when decoded entities
  * introduce literal angle brackets — `&lt;tag&gt;` decodes to
  * `<tag>`, which is CONTENT after one pass but would be stripped as
  * markup by a second. That is inherent to emitting plain text
  * (trafilatura output has the same property), which is why entity
  * decode runs after tag-stripping and exactly once. */
object Extract {

  val ScriptPat = "(?is)<script[^>]*>.*?</script>"
  val StylePat = "(?is)<style[^>]*>.*?</style>"
  val CommentPat = "(?s)<!--.*?-->"
  val BlockTagPat =
    "(?i)</?(?:blockquote|section|article|header|footer|table|form|nav|div|pre|ul|ol|li|tr|td|th|br|p|h[1-6])(\\s[^>]*)?/?>"
  val TagPat = "<[^>]*>"

  /** The extracted main text of an HTML column — the full stage chain
    * as one scan-local expression. Entity decode (stage 5) is the
    * native [[graft.functions.EntityExpressions.DecodeHtmlEntities]]
    * scan: full named + decimal + hex decode across the Unicode range
    * (r16; the pre-r16 composed-column form was 9 passes restricted to
    * printable ASCII), with `&amp;` last so `&amp;lt;` stays the
    * literal `&lt;` — the decode-order contract the oracle mirrors. */
  def mainText(html: Column, minWords: Int = 3): Column = {
    val noScript = regexp_replace(html, ScriptPat, "")
    val noStyle = regexp_replace(noScript, StylePat, "")
    val noComment = regexp_replace(noStyle, CommentPat, "")
    val blocks = regexp_replace(noComment, BlockTagPat, "\n")
    val noTags = regexp_replace(blocks, TagPat, "")
    val decoded = graft.functions.EntityExpressions
      .decode_html_entities(noTags)
    // collapse horizontal whitespace so the word count below is a
    // plain single-space split in both engines
    val norm = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val kept = filter(transform(split(norm, "\n"), l => trim(l)),
      l => length(l) > 0 &&
        size(split(l, " ")) >= minWords &&
        l.rlike("[A-Za-z]"))
    array_join(kept, "\n")
  }

  /** href targets of anchor tags — the OTHER thing a crawl reads off a
    * page besides its text: outbound links are the frontier's
    * discovery signal and the edges of the host graph a
    * PageRank-style prioritizer runs on ([[Graph.hostRank]]).
    * Documented subset (the oracle-portable regex core): double-quoted
    * `href` attributes on `<a …>` tags, case-insensitive, no
    * lookaround (RE2-portable); single-quoted and bare attribute forms
    * are a pattern extension, not a design change. Scan-local. */
  def links(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** One row per anchor element: (srcCol, href, anchor_text) — the
    * LABEL the web gives a target page, the classic relevance /
    * quality signal (anchor text describes the target better than the
    * target's own boilerplate; search and crawl rankers have weighted
    * it since the first link-analysis papers). Same documented subset
    * as [[links]] (double-quoted `href`, case-insensitive, no nested
    * anchors); the inner markup is tag-stripped, entity-decoded (the
    * [[mainText]] decode contract — after tag-strip, exactly once),
    * and whitespace-collapsed. Scan-local: two aligned
    * `regexp_extract_all` passes over the same pattern (groups 1 and
    * 2) + one positional explode. */
  def anchors(pages: DataFrame, srcCol: String = "src_domain",
              htmlCol: String = "html"): DataFrame = {
    val pat = "(?i)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>([\\s\\S]*?)</a>"
    val clean = (raw: Column) => trim(regexp_replace(
      graft.functions.EntityExpressions.decode_html_entities(
        regexp_replace(raw, "<[^>]*>", " ")),
      "\\s+", " "))
    pages
      .withColumn("__hrefs",
        regexp_extract_all(col(htmlCol), lit(pat), lit(1)))
      .withColumn("__texts",
        regexp_extract_all(col(htmlCol), lit(pat), lit(2)))
      .select(col(srcCol), col("__texts"),
        posexplode(col("__hrefs")).as(Seq("__i", "href")))
      .select(col(srcCol), col("href"),
        clean(element_at(col("__texts"), col("__i") + 1))
          .as("anchor_text"))
  }

  /** Per-document extraction over a raw-markup corpus: the main text
    * plus the shape signals a crawl pipeline filters on next (a page
    * whose markup stripped to nothing is itself a quality verdict). */
  def extract(docs: DataFrame, htmlCol: String = "html",
              minWords: Int = 3): DataFrame =
    docs.select(
        col("doc_id"),
        mainText(col(htmlCol), minWords).as("main_text"))
      .select(col("doc_id"), col("main_text"),
        when(length(col("main_text")) === 0, lit(0L))
          .otherwise(size(split(col("main_text"), "\n")).cast("long"))
          .as("n_lines"),
        length(col("main_text")).cast("long").as("n_chars"))
}

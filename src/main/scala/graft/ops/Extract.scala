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
  *  5. decode the common entities (`&nbsp; &lt; &gt; &quot; &#39;
  *     &apos;`, and `&amp;` LAST so `&amp;lt;` correctly yields the
  *     literal `&lt;`),
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

  /** Decode order is load-bearing: `&amp;` last (see scaladoc). */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** The extracted main text of an HTML column — the full stage chain
    * as one scan-local expression. */
  def mainText(html: Column, minWords: Int = 3): Column = {
    val noScript = regexp_replace(html, ScriptPat, "")
    val noStyle = regexp_replace(noScript, StylePat, "")
    val noComment = regexp_replace(noStyle, CommentPat, "")
    val blocks = regexp_replace(noComment, BlockTagPat, "\n")
    val noTags = regexp_replace(blocks, TagPat, "")
    // entity tokens contain no regex metacharacters, so regexp_replace
    // here IS a plain global replace — the oracle mirrors it with
    // DuckDB's replace(). Named entities and &amp; (last) bracket the
    // numeric decode: &amp;#39; must yield the LITERAL "&#39;", so the
    // numeric pass runs before the &amp; pass, same as the named ones.
    val named = Entities.dropRight(1).foldLeft(noTags) { case (c, (ent, rep)) =>
      regexp_replace(c, ent, rep)
    }
    val numeric = decodeNumericEntities(named)
    val decoded = regexp_replace(numeric, Entities.last._1, Entities.last._2)
    // collapse horizontal whitespace so the word count below is a
    // plain single-space split in both engines
    val norm = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val kept = filter(transform(split(norm, "\n"), l => trim(l)),
      l => length(l) > 0 &&
        size(split(l, " ")) >= minWords &&
        l.rlike("[A-Za-z]"))
    array_join(kept, "\n")
  }

  /** Generic decimal entity decode (`&#NNN;`) for the PRINTABLE-ASCII
    * range [32, 126] — the range where Spark's `char` (ASCII, mod-256
    * above) and DuckDB's `chr` (code-point) agree, so the decode is
    * cross-engine exact; out-of-range and malformed forms stay
    * literal. No regexp-replace-with-callback exists in either
    * engine, so the mechanism is split-on-`&#` → per-segment CASE
    * (decode the leading `NNN;` or restore the split marker) →
    * ordered reassembly — still one scan-local expression. */
  private[ops] def decodeNumericEntities(c: Column): Column = {
    def decodeSeg(s: Column): Column = {
      val code = regexp_extract(s, "^([0-9]{1,7});", 1).cast("int")
      when(s.rlike("^[0-9]{1,7};") && code.between(32, 126),
        concat(call_function("char", code),
          regexp_replace(s, "^[0-9]{1,7};", "")))
        .otherwise(concat(lit("&#"), s))
    }
    // single-reference form: `c` (the whole upstream regex chain)
    // appears EXACTLY ONCE. Higher-order functions run interpreted,
    // where repeated references re-evaluate their subtree (no
    // codegen subexpression elimination) — an element_at + slice +
    // guard formulation referenced the 12-pass chain 4× and read 4×
    // on q145. The index-0 element is the pre-marker prefix and
    // passes through verbatim; a marker-free text is a 1-element
    // array and reassembles to itself.
    array_join(
      transform(split(c, "&#"),
        (s, i) => when(i === 0, s).otherwise(decodeSeg(s))), "")
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

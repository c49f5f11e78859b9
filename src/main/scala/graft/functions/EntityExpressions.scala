package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full HTML entity decode as ONE native expression — named entities,
  * decimal (`&#8217;`) and hex (`&#x27;`) numeric references across the
  * whole Unicode range, with `&amp;` decoded LAST so escaped entities
  * (`&amp;lt;` → the literal `&lt;`) never double-decode.
  *
  * This replaces the previous composed-column decode (7 sequential
  * `regexp_replace` passes + a split/transform/array_join numeric pass
  * restricted to printable ASCII, `Extract.scala` pre-r16): one JVM
  * scan instead of ~9 interpreted passes over the string, and the full
  * code-point range instead of [32,126] — the high code points
  * (`&#8217;`, the curly apostrophe that saturates real crawl text)
  * previously leaked literal entity text into every downstream token,
  * shingle, and LSH signature.
  *
  * Semantics are defined to be EXACTLY the multi-pass oracle
  * formulation (DuckDB mirrors it with sequential `replace()` calls, a
  * split-on-`&#` reassembly, and a final `&amp;` replace), proven
  * equivalent to this one-scan form because entity occurrences cannot
  * overlap (each token is `&…;` with no interior `&` or `;`, so no
  * token is a prefix or infix of another) and decoded output is never
  * rescanned in either form:
  *
  *  1. named pass — each `(name, replacement)` in [[HtmlEntities.Named]]
  *     replaced globally; unknown names (`&unknown;`) stay literal,
  *  2. numeric pass — `&#NNN;` (1–7 decimal digits) and `&#xHHHH;`
  *     (1–6 hex digits, either case) decode iff the code point is
  *     valid-and-printable: in [32,126] or [160,0x10FFFF] minus the
  *     surrogate block [0xD800,0xDFFF]. Control ranges (0–31, DEL +
  *     C1 127–159, where HTML5 would remap through windows-1252),
  *     surrogates, beyond-Unicode values, and malformed forms
  *     (`&#x;`, digit runs past the length cap) stay literal,
  *  3. `&amp;` → `&` as a final pass over the decoded output (so a
  *     decode that juxtaposes `&` + `amp;` resolves the same way in
  *     both engines — the ordering contract the oracle generator
  *     mirrors).
  *
  * The decoded-output-not-rescanned rule also makes the named and
  * numeric passes order-independent: no replacement string contains
  * `&`, `#`, or `;`, so passes can neither create nor destroy each
  * other's matches — which is what lets the single scan interleave
  * them. */
object EntityExpressions {

  object HtmlEntities {

    /** The named entities decoded by the named pass, `&amp;` excluded
      * (it is the separate FINAL pass). Single source of truth: the
      * engine scan and the DuckDB oracle replace-chain both generate
      * from this Seq. Names are case-sensitive (the HTML rule:
      * `&Eacute;` ≠ `&eacute;`); replacements are single non-ASCII-
      * delimiter characters (never `&`, `#`, `;`, or `'`-breaking for
      * SQL embedding — `&apos;`'s quote is escaped by the generator). */
    val Named: Seq[(String, String)] = Seq(
      // the core markup five (minus amp)
      "nbsp" -> " ", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "apos" -> "'",
      // typographic punctuation (the high-frequency crawl set)
      "mdash" -> "—", "ndash" -> "–",
      "lsquo" -> "‘", "rsquo" -> "’",
      "ldquo" -> "“", "rdquo" -> "”",
      "hellip" -> "…", "bull" -> "•",
      "dagger" -> "†", "permil" -> "‰",
      "laquo" -> "«", "raquo" -> "»",
      "middot" -> "·", "shy" -> "\u00ad", // soft hyphen
      // signs and units
      "copy" -> "©", "reg" -> "®", "trade" -> "™",
      "deg" -> "°", "plusmn" -> "±",
      "times" -> "×", "divide" -> "÷",
      "frac12" -> "½", "frac14" -> "¼",
      "sup2" -> "²", "sup3" -> "³",
      "micro" -> "µ", "sect" -> "§", "para" -> "¶",
      "euro" -> "€", "pound" -> "£",
      "yen" -> "¥", "cent" -> "¢",
      "larr" -> "←", "rarr" -> "→",
      // Latin-1 letters (the western-European crawl set)
      "eacute" -> "é", "egrave" -> "è", "ecirc" -> "ê",
      "agrave" -> "à", "acirc" -> "â", "aacute" -> "á",
      "ccedil" -> "ç", "ocirc" -> "ô", "oacute" -> "ó",
      "ouml" -> "ö", "uuml" -> "ü", "auml" -> "ä",
      "iacute" -> "í", "uacute" -> "ú",
      "ntilde" -> "ñ", "szlig" -> "ß",
      "oelig" -> "œ", "aelig" -> "æ",
      "Eacute" -> "É", "Agrave" -> "À", "Ccedil" -> "Ç",
      "Ouml" -> "Ö", "Uuml" -> "Ü", "Auml" -> "Ä")

    /** The final pass: `&amp;` → `&`, AFTER named + numeric. */
    val Amp: (String, String) = "&amp;" -> "&"

    private val NamedMap: java.util.HashMap[String, String] = {
      val m = new java.util.HashMap[String, String](Named.size * 2)
      Named.foreach { case (n, r) => m.put(n, r) }
      m
    }
    private val MaxNameLen = Named.map(_._1.length).max

    /** A decodable code point: printable ASCII, or a valid non-control
      * non-surrogate scalar value (see object scaladoc, rule 2). The
      * DuckDB oracle generator embeds this exact predicate. */
    def validCodePoint(c: Int): Boolean =
      (c >= 32 && c <= 126) ||
        (c >= 160 && c <= 0x10FFFF && !(c >= 0xD800 && c <= 0xDFFF))

    private def hexVal(ch: Char): Int =
      if (ch >= '0' && ch <= '9') ch - '0'
      else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
      else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
      else -1

    /** The three-pass decode (see object scaladoc) as one scan plus the
      * final `&amp;` replace. Allocation-free when no `&` occurs. */
    def decode(s: String): String = {
      var i = s.indexOf('&')
      if (i < 0) return s
      val n = s.length
      val sb = new java.lang.StringBuilder(n)
      sb.append(s, 0, i)
      while (i < n) {
        val ch = s.charAt(i)
        if (ch != '&') { sb.append(ch); i += 1 }
        else if (i + 1 < n && s.charAt(i + 1) == '#') {
          // numeric branch: &#NNN; or &#xHHHH;
          var j = i + 2
          val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
          if (hex) j += 1
          val start = j
          var code = 0L
          if (hex) {
            while (j < n && hexVal(s.charAt(j)) >= 0 && j - start <= 6) {
              code = code * 16 + hexVal(s.charAt(j)); j += 1
            }
          } else {
            while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9'
                && j - start <= 7) {
              code = code * 10 + (s.charAt(j) - '0'); j += 1
            }
          }
          val runLen = j - start
          val maxLen = if (hex) 6 else 7
          // the run must END within the cap (a longer run means the
          // {1,cap} regex form cannot place `;` after any prefix,
          // because every prefix is followed by another digit)
          val ok = runLen >= 1 && runLen <= maxLen &&
            j < n && s.charAt(j) == ';' && validCodePoint(code.toInt)
          if (ok) { sb.appendCodePoint(code.toInt); i = j + 1 }
          else { sb.append("&#"); i += 2 } // split-restore semantics
        } else {
          // named branch: &name; with name in [A-Za-z0-9]{1,MaxNameLen}
          var j = i + 1
          while (j < n && j - i - 1 < MaxNameLen && {
            val c = s.charAt(j)
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9')
          }) j += 1
          val rep =
            if (j > i + 1 && j < n && s.charAt(j) == ';')
              NamedMap.get(s.substring(i + 1, j))
            else null
          if (rep != null) { sb.append(rep); i = j + 1 }
          else { sb.append('&'); i += 1 }
        }
      }
      sb.toString.replace(Amp._1, Amp._2)
    }
  }

  /** HTML entity decode of a string column (see [[HtmlEntities]]).
    * CodegenFallback is deliberate (the house rule from
    * `TextExpressions`): the scan loop is the entire cost; one virtual
    * eval per row is noise, and the expression stays one scan-local
    * projection either way. */
  case class DecodeHtmlEntities(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        HtmlEntities.decode(input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column form of [[DecodeHtmlEntities]]. */
  def decode_html_entities(c: Column): Column =
    ColumnBridge.column(DecodeHtmlEntities(ColumnBridge.expression(c)))
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String, minWords: Int = 3): String =
    Seq((0L, html)).toDF("doc_id", "html")
      .select(Extract.mainText(col("html"), minWords).as("t"))
      .head().getString(0)

  test("scripts, styles, and comments are dropped WITH their content") {
    val got = extractOne(
      "<html><head><style>p { color: red; }</style>" +
        "<script>var x = 1 < 2; // tricky </script></head>" +
        "<body><!-- a comment with words words words -->" +
        "<p>real prose stays right here</p></body></html>")
    assert(got === "real prose stays right here")
    // multiline + case-insensitive forms too
    val got2 = extractOne(
      "<SCRIPT type=\"text/javascript\">\nif (a<b) {\n  run();\n}\n</SCRIPT>" +
        "<p>the visible line of text</p><STYLE>\nbody{}\n</STYLE>")
    assert(got2 === "the visible line of text")
  }

  test("entities decode after tag-strip, &amp; last") {
    val got = extractOne(
      "<p>Tom&nbsp;&amp;&nbsp;Jerry say &quot;hi&quot; it&#39;s &amp;lt; fine</p>")
    // &amp;lt; is the literal text "&lt;" (decode order is load-bearing)
    assert(got === "Tom & Jerry say \"hi\" it's &lt; fine")
    // decoded angle brackets are CONTENT after one pass…
    val one = extractOne("<p>compare &lt;a&gt; with b and c</p>")
    assert(one === "compare <a> with b and c")
    // …and markup to a second pass — the documented one-pass contract
    val two = extractOne(one)
    assert(two === "compare with b and c")
  }

  test("numeric entities decode across the Unicode range (decimal + hex); invalid classes stay literal") {
    val got = extractOne("<p>B&#97;y &#65;rea &#32;gap and &#8217;curly&#8217; " +
      "hex &#x27;q&#X27; then r&#xE9;sum&#233; forms</p>")
    // 97='a', 65='A', 32=space; 8217=’ (the curly apostrophe that
    // saturates real crawl text — the r16 range extension), hex 0x27='
    // (either x case), 0xE9/233=é
    assert(got === "Bay Area gap and ’curly’ hex 'q' then résumé forms")
    // stay-literal classes: DEL/C1 controls, surrogates, beyond-Unicode
    // values, malformed hex, over-long digit runs
    assert(extractOne(
      "<p>bad forms &#127; &#xD800; &#1114112; &#x; &#12345678; stay put</p>")
      === "bad forms &#127; &#xD800; &#1114112; &#x; &#12345678; stay put")
    // &amp;#66; is the LITERAL "&#66;" — the numeric pass runs before
    // the &amp; pass, so escaped entities never double-decode
    assert(extractOne("<p>keep &amp;#66; literal here</p>")
      === "keep &#66; literal here")
    // malformed forms restore the marker verbatim
    assert(extractOne("<p>dangling &# marker left behind here</p>")
      === "dangling &# marker left behind here")
    // the pass-order contract: a numeric decode that juxtaposes
    // "&" + "amp;" resolves through the FINAL amp pass (both engines)
    assert(extractOne("<p>edge &#38;amp; case here</p>")
      === "edge & case here")
  }

  test("named entities: extended set decodes; unknown names stay literal; names are case-sensitive") {
    assert(extractOne("<p>caf&eacute; &mdash; &Eacute;tat &copy;2026 3&frac12;&deg; ok</p>")
      === "café — État ©2026 3½° ok")
    assert(extractOne("<p>stay &unknown; and &EACUTE; literal here</p>")
      === "stay &unknown; and &EACUTE; literal here")
    // &amp;eacute; is the literal "&eacute;" (amp decodes LAST)
    assert(extractOne("<p>escaped &amp;eacute; stays entity text</p>")
      === "escaped &eacute; stays entity text")
  }

  test("block tags split lines; short boilerplate lines are cut; prose survives") {
    val got = extractOne(
      "<body><div class=\"nav\">Home</div><h1>Big Title</h1>" +
        "<ul><li>About</li><li>Contact</li></ul>" +
        "<p>this paragraph has plenty of words</p>" +
        "<p>so does this second block of prose</p>" +
        "<footer>2026 — numbers-only line 123 456</footer></body>")
    // nav ("Home"), heading ("Big Title"), list items: under minWords.
    // The footer line has >= 3 tokens AND a letter, so it stays.
    assert(got ===
      "this paragraph has plenty of words\nso does this second block of prose\n" +
        "2026 — numbers-only line 123 456")
    // a >=3-token line with no letters is cut
    assert(extractOne("<p>12 34 56 78</p>") === "")
    // minWords is a knob
    assert(extractOne("<h1>Big Title</h1>", minWords = 2) === "Big Title")
  }

  test("attribute-tail block pattern: <param> is not <p...>") {
    // <param name=...> must be stripped as an inline/unknown tag, not
    // matched by the block alternation's `p` branch (RE2 has no
    // lookahead, so the pattern uses an explicit attribute tail)
    val got = extractOne("<p>words before<param name=\"x\">words after here</p>")
    // if <param> were a block tag the text would split into two lines
    // ("words before" dropped at minWords=3); instead it joins
    assert(got === "words beforewords after here")
    // self-closing and attributed block forms still split
    assert(extractOne("<p>first line of text<br/>second line of text</p>")
      === "first line of text\nsecond line of text")
    assert(extractOne(
      "<div id=\"a\">one two three four</div><div class=\"b\">five six seven eight</div>")
      === "one two three four\nfive six seven eight")
  }

  test("whitespace collapses; extraction is idempotent on angle-free output") {
    val html = "<p>some spaced \t words\r\n  in   here ok</p>"
    val got = extractOne(html)
    assert(got === "some spaced words\nin here ok")
    assert(extractOne(got) === got)
    // a page that strips to nothing
    val df = Seq((1L, "<html><head><script>x()</script></head><body><!-- x --></body></html>"))
      .toDF("doc_id", "html")
    val r = Extract.extract(df).head()
    assert(r.getAs[String]("main_text") === "")
    assert(r.getAs[Long]("n_lines") === 0L)
    assert(r.getAs[Long]("n_chars") === 0L)
  }

  test("extract() shape: per-line count and chars over a multi-doc frame") {
    val df = Seq(
      (0L, "<p>alpha beta gamma delta</p><p>epsilon zeta eta theta</p>"),
      (1L, "plain words already here with no markup at all"))
      .toDF("doc_id", "html")
    val rows = Extract.extract(df).orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_lines") === 2L)
    assert(rows(1).getAs[String]("main_text") ===
      "plain words already here with no markup at all")
    assert(rows(1).getAs[Long]("n_lines") === 1L)
    // scan-local: no shuffle in the plan
    val plan = Extract.extract(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extract() must not shuffle:\n$plan")
  }

  test("anchors: href/text pairs aligned; inner markup stripped, entities decoded, whitespace collapsed") {
    val df = Seq(
      (1L, """<p>x</p><a href="http://a.com/1">Read &amp; visit <b>site one</b>  now</a>""" +
        """<A CLASS="z" HREF="http://b.com/2"> plain  label </A>"""),
      (2L, "<p>no anchors here</p>"),
      (3L, """<a href="http://c.com/3"><img src="i.png"></a>""") // markup-only label
    ).toDF("doc_id", "html")
    val got = Extract.anchors(df, srcCol = "doc_id")
      .orderBy("doc_id", "href").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, "http://a.com/1", "Read & visit site one now"),
      (1L, "http://b.com/2", "plain label"),
      (3L, "http://c.com/3", "")))
    // pair alignment survives an anchor COUNT > 1 with differing text
    // lengths — href i always carries text i, never a neighbor's
    val many = Seq((9L, (1 to 5).map(i =>
      s"""<a href="http://h.com/$i">label $i</a>""").mkString))
      .toDF("doc_id", "html")
    val pairs = Extract.anchors(many, srcCol = "doc_id")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert((1 to 5).forall(i => pairs(s"http://h.com/$i") == s"label $i"))
    // scan-local
    val plan = Extract.anchors(df, srcCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"anchors() must not shuffle:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev measurement: `ops.Extract` throughput on PAGE-SIZED documents.
  * The sf corpora's docs are ~300 chars; real crawl pages are
  * 10–100 KB, and the extractor is a 12-pass regex/replace chain whose
  * cost scales with bytes × passes — this probe prices it honestly.
  * Synthesizes n pages of ~`kb` KB each (repeated markup-heavy
  * paragraphs around the sf text), runs `Extract.extract`, prints
  * MB/s. Usage: `dev/run.sh graft.ExtractProbe [n] [kb]`. */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val kb = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = GraftSession.local("extract-probe")
    spark.sparkContext.setLogLevel("ERROR")
    // ~1 KB markup-heavy paragraph, repeated kb times per page
    val para = "<div class=\"row\"><p>The quick brown fox jumps over the " +
      "lazy dog near the river bank &amp; waits for the evening train " +
      "to pass &#8212; it&#39;s late. </p><span>inline</span>" +
      "<script>track(1 < 2);</script>" +
      "<!-- ad slot --><ul><li>Nav</li></ul>" +
      ("<p>" + ("lorem ipsum dolor sit amet consectetur " * 4) + "</p>")
    val pages = spark.range(n).selectExpr(
      "id AS doc_id",
      s"concat('<html><head><title>p', id, '</title><style>a{}</style></head><body>', " +
        s"repeat('${para.replace("'", "''")}', $kb), '</body></html>') AS html")
      .cache()
    val bytes = pages.select(sum(length(col("html")))).head().getLong(0)
    def wall(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    pages.count()
    for (round <- 1 to 3) {
      val t = wall(ops.Extract.extract(pages)
        .select(sum(col("n_chars"))).head().getLong(0))
      println(f"round $round: n=$n pages, ${bytes / 1e6}%.0f MB in $t%.1f s = " +
        f"${bytes / 1e6 / t}%.1f MB/s (${n / t}%.0f pages/s)")
    }
    spark.stop()
  }
}

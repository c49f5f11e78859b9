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

  /** `dev/run.sh graft.ExtractProbe wet [files]` — the 100× crawl
    * front-end stress (r16 verdict #7): the docs100 replica's 500k
    * texts planted into markup-heavy pages, exported as a
    * multi-file WET segment set (`writeWet(singleFile = false)`),
    * then the full read path timed: splittable lineSep framing →
    * record parse → extraction, MB/s over the on-disk segment bytes.
    * Requires `ScaleUp docs100` to have run. */
  private def wetProbe(spark: org.apache.spark.sql.SparkSession,
                       files: Int): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet("/tmp/graft-sf10-docs/documents.parquet")
    val entFooter = "<footer>caf&eacute; &mdash; r&#xE9;sum&#233; " +
      "&#8217;curly&#8217; &amp;#66; &unknown; 2026</footer>"
    val pages = docs.selectExpr("doc_id",
      s"""concat('<html><head><title>d', doc_id,
          '</title><style>a{}</style><script>if(1<2){x("&")}</script>',
          '</head><body><div class="nav">Home</div><p>', text,
          '</p>$entFooter</body></html>') AS text""")
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-100x").toString
    def wall(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tw = wall(ops.Warc.writeWet(
      pages.repartition(files), s"$dir/wet", singleFile = false))
    val bytes = new java.io.File(s"$dir/wet").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length()).sum
    println(f"write: ${bytes / 1e6}%.0f MB as $files WET files in $tw%.1f s" +
      f" = ${bytes / 1e6 / tw}%.1f MB/s")
    for (round <- 1 to 3) {
      val recs = ops.Warc.readWet(spark, s"$dir/wet")
        .where(col("wtype") === "conversion")
      val t = wall(recs
        .select(ops.Extract.mainText(col("payload")).as("t"))
        .select(sum(length(col("t")))).head().getLong(0))
      println(f"read+extract round $round: ${bytes / 1e6}%.0f MB in $t%.1f s" +
        f" = ${bytes / 1e6 / t}%.1f MB/s")
    }
    val audit = ops.Warc.wetAudit(spark, s"$dir/wet")
      .agg(sum("n_records"), sum("n_fragments")).head()
    println(s"audit: records=${audit.getLong(0)} fragments=${audit.getLong(1)}")
    // the byte-exact Content-Length reader on the same corpus — its
    // per-record header parse + payload copy vs the lineSep framing
    val twx = wall(ops.Warc.writeWetExact(
      pages.repartition(files), s"$dir/wetx", singleFile = false))
    val bytesX = new java.io.File(s"$dir/wetx").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length()).sum
    println(f"exact write: ${bytesX / 1e6}%.0f MB in $twx%.1f s" +
      f" = ${bytesX / 1e6 / twx}%.1f MB/s")
    for (round <- 1 to 3) {
      val t = wall(ops.Warc.readWetExact(spark, s"$dir/wetx")
        .where(col("wtype") === "conversion")
        .select(ops.Extract.mainText(col("payload")).as("t"))
        .select(sum(length(col("t")))).head().getLong(0))
      println(f"exact read+extract round $round: ${bytesX / 1e6}%.0f MB" +
        f" in $t%.1f s = ${bytesX / 1e6 / t}%.1f MB/s")
    }
  }

  /** `dev/run.sh graft.ExtractProbe entities [n]` — entity-density
    * sweep: fixed ~10 KB pages whose text is 0% / ~15% / ~40% entity
    * tokens. The decode is one linear scan + one literal replace, so
    * MB/s must stay flat as density rises — a quadratic in the
    * numeric split would bend here. */
  private def entityProbe(spark: org.apache.spark.sql.SparkSession,
                          n: Long): Unit = {
    def wall(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val plain = "lorem ipsum dolor sit amet consectetur adipiscing elit "
    val dense = "caf&eacute; &#8217;x&#8217; &#x27;y&#x27; &amp; &mdash; "
    for ((label, unit) <- Seq(
        ("0% entities", plain + plain),
        ("~15% entities", plain + dense),
        ("~40% entities", dense + dense))) {
      val pages = spark.range(n).selectExpr("id AS doc_id",
        s"concat('<html><body><p>', repeat('${unit.replace("'", "''")}', 90), " +
          "'</p></body></html>') AS html").cache()
      val bytes = pages.select(sum(length(col("html")))).head().getLong(0)
      pages.count()
      val times = (1 to 3).map(_ => wall(ops.Extract.extract(pages)
        .select(sum(col("n_chars"))).head().getLong(0)))
      println(f"$label%14s: ${bytes / 1e6}%.0f MB, warm ${times.min}%.2f s" +
        f" = ${bytes / 1e6 / times.min}%.1f MB/s")
      pages.unpersist()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("wet")) {
      val spark = GraftSession.local("extract-probe")
      spark.sparkContext.setLogLevel("ERROR")
      wetProbe(spark, args.lift(1).map(_.toInt).getOrElse(64))
      spark.stop(); return
    }
    if (args.headOption.contains("entities")) {
      val spark = GraftSession.local("extract-probe")
      spark.sparkContext.setLogLevel("ERROR")
      entityProbe(spark, args.lift(1).map(_.toLong).getOrElse(20000L))
      spark.stop(); return
    }
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

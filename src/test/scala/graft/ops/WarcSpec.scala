package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  test("readWet: records parse fields and payload; warcinfo and CRLF dialects; fragments surface") {
    val dir = Files.createTempDirectory("graft-wet-spec").toString
    val wet =
      "WARC/1.0\nWARC-Type: warcinfo\n\nsoftware: graft\n\n" +
        "WARC/1.0\nWARC-Type: conversion\n" +
        "WARC-Target-URI: http://a.example/x\n" +
        "WARC-Date: 2026-08-16T00:00:00Z\n\n" +
        "first page text\nwith a second line\n\n" +
        // CRLF dialect (real Common-Crawl WET uses \r\n)
        "WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://b.example/y\r\n" +
        "WARC-Date: 2026-08-16T01:00:00Z\r\n\r\n" +
        "crlf payload line\r\n"
    writeFile(dir, "seg.wet", wet)
    val got = Warc.readWet(spark, dir).orderBy("uri").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.length === 3)
    assert(got(0) === ("warcinfo", "", "", "software: graft"))
    assert(got(1) ===
      ("conversion", "http://a.example/x", "2026-08-16T00:00:00Z",
        "first page text\nwith a second line"))
    assert(got(2) ===
      ("conversion", "http://b.example/y", "2026-08-16T01:00:00Z",
        "crlf payload line"))
    // a payload containing the marker mis-splits BY CONTRACT: the tail
    // surfaces as a fragment row with empty wtype/uri — visible, never
    // silently merged
    val dir2 = Files.createTempDirectory("graft-wet-frag").toString
    writeFile(dir2, "frag.wet",
      "WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: http://c.example/z\n\n" +
        "text mentioning WARC/1.0 inline\n")
    val rows2 = Warc.readWet(spark, dir2).collect()
    assert(rows2.length === 2)
    assert(rows2.count(_.getString(0) === "") === 1)
  }

  test("readWet: gzipped segments parse transparently (.wet.gz, the Common-Crawl shape)") {
    // real Common-Crawl WET segments ship as .wet.gz; Spark's text
    // source decompresses gzip by codec inference from the extension.
    // Scale note (scaladoc'd): a gzip file is ONE split — parallelism
    // is per-file, which matches the crawl's many-segments layout.
    val dir = Files.createTempDirectory("graft-wet-gz").toString
    val content =
      "WARC/1.0\nWARC-Type: conversion\n" +
        "WARC-Target-URI: http://gz.example/a\n" +
        "WARC-Date: 2026-08-16T02:00:00Z\n\ngz payload text here\n"
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(Paths.get(dir, "seg.wet.gz")))
    out.write(content.getBytes("UTF-8")); out.close()
    val got = Warc.readWet(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(got.toSeq === Seq(
      ("conversion", "http://gz.example/a", "gz payload text here")))
  }

  test("writeWet -> readWet round-trips a corpus exactly") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "multi\nline\n\ndocument"),
      (2L, "")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-wet-rt").toString
    Warc.writeWet(docs, s"$dir/wet")
    val back = Warc.readWet(spark, s"$dir/wet")
      .where(col("wtype") === "conversion")
      .select(col("uri"), col("payload")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(
      ("http://example.com/doc/0", "alpha beta gamma"),
      ("http://example.com/doc/1", "multi\nline\n\ndocument"),
      ("http://example.com/doc/2", "")))
    // the warcinfo header record is present exactly once
    assert(Warc.readWet(spark, s"$dir/wet")
      .where(col("wtype") === "warcinfo").count() === 1)
  }
}

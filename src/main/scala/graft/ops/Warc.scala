package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET (WARC extracted-text) source reader — the file format a real
  * crawl actually lands in: a Common-Crawl WET segment is a
  * concatenation of records, each `WARC/1.0` + header lines + blank
  * line + text payload. This reader turns a WET file set into a
  * records relation `(wtype, uri, warc_date, payload)` so the rest of
  * the pipeline (extraction for raw WARC, language-ID/quality/dedup
  * for WET) starts from the bytes a crawl delivers.
  *
  * Scale design: framing rides Spark's native custom line separator
  * (`spark.read.option("lineSep", marker)`) — Hadoop's
  * LineRecordReader splits on the marker AT THE READER, handling
  * records that straddle HDFS block boundaries the same way plain
  * line reading does, so the scan parallelizes like any text source
  * (no whole-file reads, no driver-side splitting). Header fields
  * parse with anchored multiline regexes; the payload is everything
  * after the first blank line, CRLF-normalized, trailing record
  * padding stripped.
  *
  * Framing contract (documented limitation): records are delimited by
  * the raw marker OCCURRENCE, not by Content-Length — the streaming
  * framing a splittable text reader can honor. A payload that itself
  * contains the marker string would split there; the tail fragment
  * surfaces as a row with `wtype = ''` and `uri = ''` (no header
  * block), which callers filter or audit — the same visibility rule
  * as the engine's other refuse-or-surface contracts. Real WET
  * conversion payloads are tag-stripped text in which `WARC/1.0`
  * essentially never occurs; byte-exact Content-Length framing needs
  * a custom binary InputFormat, deliberately out of scope. */
object Warc {

  val Marker = "WARC/1.0"

  /** Read a WET file set into one row per record. `wtype` is the
    * WARC-Type header (`warcinfo`, `conversion`, …); fragment rows
    * (see framing contract) carry empty `wtype`/`uri`. Gzipped
    * segments (`.wet.gz`, the Common-Crawl shape) decompress
    * transparently via the text source's codec inference — each gzip
    * file is ONE split, so parallelism is per-file, which matches the
    * crawl's many-small-segments layout (spec-asserted). */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Marker).text(path)
    // per-file preamble before the first marker is an empty split
    val recs = raw.where(length(trim(col("value"))) > 0)
      .select(regexp_replace(col("value"), "\r\n", "\n").as("v"))
    val header = substring_index(col("v"), "\n\n", 1)
    recs.select(
        regexp_extract(header, "(?m)^WARC-Type:\\s*(\\S+)", 1).as("wtype"),
        regexp_extract(header, "(?m)^WARC-Target-URI:\\s*(\\S+)", 1).as("uri"),
        regexp_extract(header, "(?m)^WARC-Date:\\s*(\\S+)", 1).as("warc_date"),
        when(instr(col("v"), "\n\n") > 0,
          regexp_replace(
            col("v").substr(instr(col("v"), "\n\n") + lit(2),
              length(col("v"))),
            "\n+$", ""))
          .otherwise(lit("")).as("payload"))
  }

  /** Write a corpus as a WET file set — the round-trip twin of
    * [[readWet]] (and the q149 fixture writer): one `conversion`
    * record per document plus a leading `warcinfo` record per file.
    * Deterministic headers so the round-trip is exactly invertible. */
  def writeWet(docs: DataFrame, path: String,
               uriPrefix: String = "http://example.com/doc/",
               idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val info = Seq(s"$Marker\nWARC-Type: warcinfo\n\nsoftware: graft\n")
      .toDF("value")
    val recs = docs.select(concat(
      lit(s"$Marker\nWARC-Type: conversion\nWARC-Target-URI: $uriPrefix"),
      col(idCol).cast("string"),
      lit("\nWARC-Date: 2026-08-16T00:00:00Z\n\n"),
      col(textCol), lit("\n")).as("value"))
    info.unionByName(recs).coalesce(1)
      .write.mode("overwrite").text(path)
  }
}

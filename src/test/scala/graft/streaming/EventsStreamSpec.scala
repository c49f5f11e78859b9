package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Events

/** Streaming twins must agree with the batch operators on the same data. */
class EventsStreamSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("events-stream").toString
    // two time-ordered files → two micro-batches with maxFilesPerTrigger=1,
    // so session state genuinely crosses batch boundaries (split must be
    // by time, not round-robin: the sessionizer assumes in-order batches)
    val ev = Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")).cache()
    val mid = ev.agg(expr("percentile_approx(ts, 0.5)")).head().getLong(0)
    ev.where(col("ts") < mid).coalesce(1).write.parquet(s"$dir/a")
    ev.where(col("ts") >= mid).coalesce(1).write.parquet(s"$dir/b")
    dir
  }

  private def sourceGlob = s"$srcDir/*"

  test("streaming hourly window agg equals batch hourlyAgg") {
    val stream = EventsStream.readEvents(spark, sourceGlob)
    val q = EventsStream.hourlyAggStream(stream)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("hourly_stream")
      .groupBy("hour_idx", "event_type")   // update mode may emit a key twice; keep latest via max
      .agg(max("event_cnt").as("event_cnt"), max("value_cents").as("value_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = Events.hourlyAgg(Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")))
      .collect().map(r => (r.getAs[Long]("hour_idx"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("event_cnt"), r.getAs[Long]("value_cents"))).toMap
    assert(got === want)
  }

  test("deterministic hash sampling is streaming-safe and equals its batch twin") {
    // stateless scan-local filters (the Sampling ops) must behave
    // identically on a stream: same rows kept, regardless of batching
    val stream = EventsStream.readEvents(spark, sourceGlob)
    val sampled = graft.ops.Sampling.hashSample(stream, col("event_id"), 300000L)
    val q = sampled.writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("sampled_stream")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = graft.ops.Sampling.hashSample(
        Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")),
        col("event_id"), 300000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("sessionization with idle flush emits every batch session") {
    import spark.implicits._
    val stream = EventsStream.readEvents(spark, sourceGlob, maxFilesPerTrigger = Some(1))
      .as[EventsStream.Event]
    val q = EventsStream.sessionizeStream(stream, flushIdle = true)
      .writeStream.format("memory").queryName("sessions_flush")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("sessions_flush")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = Events.sessionize(Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")))
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // timeout flushes idle sessions; only sessions still inside the final
    // watermark window can be missing
    assert(got.subsetOf(batch))
    assert(got.size > (batch.size * 9) / 10,
      s"flush emitted ${got.size} of ${batch.size} sessions")
  }

  test("session_window stream emits exactly the batch session_window result") {
    import spark.implicits._
    // dedicated source dir: real halves a/b, then two far-future sentinel
    // files c/d — file order is path order, watermark advances between
    // micro-batches, so by batch d the watermark has passed every real
    // session's close and append mode has emitted them all
    val dir = Files.createTempDirectory("events-swindow").toString
    val ev = Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")).cache()
    val mid = ev.agg(expr("percentile_approx(ts, 0.5)")).head().getLong(0)
    val far = ev.agg(max("ts")).head().getLong(0) + 86400L * 1000000000L
    ev.where(col("ts") < mid).coalesce(1).write.parquet(s"$dir/a")
    ev.where(col("ts") >= mid).coalesce(1).write.parquet(s"$dir/b")
    Seq((-1L, far, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/c")
    Seq((-2L, far + 3600L * 1000000000L, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/d")
    val q = EventsStream.sessionWindowStream(
        EventsStream.readEvents(spark, s"$dir/*", maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("swindow_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = asSet(spark.table("swindow_stream"))
    val want = asSet(EventsStream.sessionWindowStream(ev))  // batch session_window
    assert(got === want)
    // and the windows agree with the hand-rolled sessionizer: same
    // starts/counts, window end = session end + the 30-minute gap
    val fromSessionize = Events.sessionize(ev)
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us") + 30L * 60L * 1000000L,
        col("n_events"), col("value_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(want === fromSessionize)
  }

  test("stream-stream join matches the equivalent batch join") {
    val stream = EventsStream.readEvents(spark, sourceGlob)
    val q = EventsStream.purchaseAttribution(stream)
      .writeStream.format("memory").queryName("attrib_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("attrib_stream")
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch equivalent over the same data
    val ev = Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val batch = EventsStream.purchaseAttribution(ev)
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // inner stream-stream join with watermarks emits matched pairs whose
    // watermark has passed; over a finite input the last window may be
    // held back, so stream results ⊆ batch and cover most of it
    assert(got.subsetOf(batch))
    assert(batch.isEmpty || got.size >= batch.size * 8 / 10,
      s"stream emitted ${got.size} of ${batch.size} pairs")
  }

  test("streaming exact dedup: duplicate in a later micro-batch is dropped") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("docs-stream").toString
    import spark.implicits._
    // batch 1: docs 0,1 ; batch 2: doc 2 = dup of 0 (after normalization), doc 3 new
    Seq((0L, "Hello, World!", "en", "s", 13L), (1L, "something else", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq((2L, "hello world", "en", "s", 11L), (3L, "a third document", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/b")
    val q = EventsStream.dedupStream(
        EventsStream.readDocuments(spark, s"$dir/*", maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val ids = spark.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L, 1L, 3L))   // doc 2 deduped against batch-1 state
  }

  test("bounded-state dedup drops in-window duplicates across micro-batches") {
    val dir = Files.createTempDirectory("docs-bounded").toString
    import spark.implicits._
    Seq((0L, "Hello, World!", "en", "s", 13L), (1L, "something else", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq((2L, "hello world", "en", "s", 11L), (3L, "a third document", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/b")
    val q = EventsStream.dedupStreamBounded(
        EventsStream.readDocuments(spark, s"$dir/*", maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val ids = spark.table("dedup_bounded").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 2 normalizes to doc 0's fingerprint and both batches run well
    // inside the retention window -> deduped against batch-1 state
    assert(ids === Set(0L, 1L, 3L))
  }

  test("streaming curation equals the batch dedup + quality gate on the same corpus") {
    val dir = Files.createTempDirectory("docs-curate").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
    // two micro-batches split by doc_id so first-seen == min-id keeper:
    // cross-batch duplicates land in batch 2 and must dedup against
    // batch-1 state
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    docs.where(col("doc_id") < mid).coalesce(1).write.parquet(s"$dir/a")
    docs.where(col("doc_id") >= mid).coalesce(1).write.parquet(s"$dir/b")
    val q = EventsStream.curateStream(
        EventsStream.readDocuments(spark, s"$dir/*", maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("curate_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toSet
    // batch twin: exact dedup (min-id keeper) + the same quality gate.
    // within-batch keeper choice is arbitrary in dropDuplicates, so
    // compare on the fingerprint-level survivors' stats instead of ids
    // when ids differ — but with id-ordered batches first-seen == min-id
    val batch = graft.ops.TextStats.statsFor(
        graft.ops.Dedup.exactDedupedCorpus(docs))
      .where(col("quality_score") >= 0.7)
      .select("doc_id", "n_chars", "n_tokens", "quality_score", "lang_pred")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toSet
    // ids can differ only for duplicates co-arriving in one micro-batch;
    // compare the content-level result (drop doc_id) exactly, and the
    // id-level result modulo that arbitrariness
    assert(got.map(t => (t._2, t._3, t._4, t._5)) ===
      batch.map(t => (t._2, t._3, t._4, t._5)))
    assert(got.size === batch.size)
  }

  test("stream + LSH compaction equals one-shot batch curation across 2 cycles") {
    val base = Files.createTempDirectory("docs-compact")
    val (srcDir, sinkDir, outDir, ckDir) =
      (s"$base/src", s"$base/sink", s"$base/compacted", s"$base/ck")
    import spark.implicits._
    // real corpus split in two id-ordered batches (first-seen == min-id
    // keeper), PLUS a planted batch-2 near-dup of a batch-1 doc: the
    // streaming fingerprint store can NOT catch it (different exact
    // text) — only the compaction's LSH stage can, which is the whole
    // point of the cycle
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .cache()
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5)")).head().getLong(0)
    val seed = docs.where(col("doc_id") < mid).orderBy("doc_id")
      .select("text").head().getString(0)
    val planted = Seq((900000L, seed + " ok", "en", "planted", (seed.length + 3).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.where(col("doc_id") < mid).coalesce(1).write.parquet(s"$srcDir/a")
    docs.where(col("doc_id") >= mid).unionByName(planted)
      .coalesce(1).write.parquet(s"$srcDir/b")
    val q = EventsStream.curateStreamCompacted(
        EventsStream.readDocuments(spark, s"$srcDir/*", maxFilesPerTrigger = Some(1)),
        sinkDir, outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSet
    val compacted = rows(spark.read.parquet(outDir))
    val oneShot = rows(graft.ops.Curation.curate(docs.unionByName(planted)))
    assert(compacted === oneShot)
    // the planted near-dup reached the sink (streaming could not drop
    // it) but not the compacted output (LSH did) — proving the
    // compaction leg does real work, not just a copy
    val sinkIds = spark.read.parquet(sinkDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sinkIds.contains(900000L))
    assert(!compacted.exists(_._1 == 900000L))
    // and it is dropped BY the LSH stage, not the quality gate
    val lshPairs = graft.ops.Dedup.nearDuplicates(
        spark.read.parquet(sinkDir), shingleSize = 2, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lshPairs.exists(_._2 == 900000L))
    docs.unpersist()
  }

  test("stateful sessionization: closed sessions match batch; state spans micro-batches") {
    import spark.implicits._
    val stream = EventsStream.readEvents(spark, sourceGlob, maxFilesPerTrigger = Some(1))
      .as[EventsStream.Event]
    val q = EventsStream.sessionizeStream(stream)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    val got = spark.table("sessions_stream")
      .select("user_id", "session_start_us", "session_end_us", "n_events", "value_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val batch = Events.sessionize(Events.withTsNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet")))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "value_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // the stream's still-open last session per user is held in state, so
    // emitted sessions = batch sessions minus each user's final one
    assert(got.subsetOf(batch))
    val lastPerUser = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    assert(got === batch -- lastPerUser)
  }
}

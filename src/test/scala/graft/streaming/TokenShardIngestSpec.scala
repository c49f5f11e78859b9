package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.{LangModel, Packer}

/** Streaming appends to the token shard store: micro-batches tokenize
  * under the frozen persisted model and extend the store through the
  * carry chain — the read-back must equal a one-shot store over
  * everything (append ≡ rebuild, here across stream batches), replays
  * must be idempotent, and empty batches must forward the lineage. */
class TokenShardIngestSpec extends SparkSpec {
  import spark.implicits._

  // enough lexical variety that BPE merges are meaningful; every doc
  // has [a-z] words (the encode convention drops wordless docs)
  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private def docsDf(ids: Seq[Long]) = ids
    .map(i => (i, (0 until (3 + (i % 5)).toInt)
      .map(j => words(((i + j) % words.size).toInt)).mkString(" "),
      "en", "spec", 10L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def storeRows(dir: String) =
    Packer.readTokenShardStore(spark, dir)
      .select("shard", "shard_pos", "skey", "pack_group", "seq_id",
        "n_tokens", "token_ids")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        r.getSeq[Int](6).mkString(","))).toSet

  test("streamed token-shard appends ≡ one-shot rebuild; replay + empty-batch safe") {
    val base = Files.createTempDirectory("graft-tsi").toString
    val (modelDir, storeDir, srcDir, ckDir, rebuildDir) =
      (s"$base/model", s"$base/store", s"$base/src", s"$base/ck", s"$base/rebuild")
    val allIds = 0L until 36L
    // the frozen tokenizer: trained once over the FULL corpus and
    // persisted — every stage below loads it, never retrains
    val model = LangModel.trainBpeModel(docsDf(allIds), nMerges = 4)
    LangModel.saveBpeModel(spark, model, modelDir)
    // initial store over the first 16 docs
    Packer.writeTokenShardStore(
      LangModel.bpeEncodeWithModel(docsDf(allIds.take(16)), model),
      storeDir, capacityTokens = 16, numGroups = 3, numShards = 2,
      seed = "e0")
    // two monotone micro-batches arrive as files (a before b)
    docsDf(allIds.slice(16, 26)).coalesce(1).write.parquet(s"$srcDir/a")
    docsDf(allIds.drop(26)).coalesce(1).write.parquet(s"$srcDir/b")
    val q = TokenShardIngest.tokenShardIngestStream(
        EventsStream.readDocuments(spark, s"$srcDir/*",
          maxFilesPerTrigger = Some(1)),
        modelDir, storeDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min")
    // the streamed store reads back as if everything was written once
    Packer.writeTokenShardStore(
      LangModel.bpeEncodeWithModel(docsDf(allIds), model),
      rebuildDir, capacityTokens = 16, numGroups = 3, numShards = 2,
      seed = "e0")
    val expect = storeRows(rebuildDir)
    assert(storeRows(storeDir) === expect)
    // replaying the last stream batch (same id, same prev) is a no-op
    TokenShardIngest.ingestTokenBatch(docsDf(allIds.drop(26)), 1L,
      modelDir, storeDir)
    assert(storeRows(storeDir) === expect)
    // an empty micro-batch forwards the carry lineage without damage
    TokenShardIngest.ingestTokenBatch(docsDf(Nil), 2L, modelDir, storeDir)
    assert(storeRows(storeDir) === expect)
    assert(new java.io.File(s"$storeDir/carry/batch=b2").exists(),
      "empty batch must still write its carry link")
    // ... and the lineage stays appendable after it
    TokenShardIngest.ingestTokenBatch(docsDf(Seq(99L)), 3L, modelDir, storeDir)
    assert(storeRows(storeDir).size >= expect.size)
  }

  test("streaming tail composes end-to-end: 3 streamed batches → epoch mixture → attention inputs ≡ one-shot twin") {
    // the r15 verdict-#7 composition: crawl batches stream in, an
    // epoch mixture is read out WITH attention inputs, byte-identical
    // to the batch rebuild — the engine's two serve-many artifacts
    // (frozen BPE model, growing shard store) driven as one pipeline
    val base = Files.createTempDirectory("graft-tsi-tail").toString
    val (modelDir, storeDir, srcDir, ckDir, rebuildDir) =
      (s"$base/model", s"$base/store", s"$base/src", s"$base/ck", s"$base/rebuild")
    val allIds = 0L until 48L
    val model = LangModel.trainBpeModel(docsDf(allIds), nMerges = 4)
    LangModel.saveBpeModel(spark, model, modelDir)
    // initial store over the first 15 docs; THREE monotone
    // micro-batches stream the rest in
    Packer.writeTokenShardStore(
      LangModel.bpeEncodeWithModel(docsDf(allIds.take(15)), model),
      storeDir, capacityTokens = 16, numGroups = 3, numShards = 2,
      seed = "e0")
    docsDf(allIds.slice(15, 26)).coalesce(1).write.parquet(s"$srcDir/a")
    docsDf(allIds.slice(26, 37)).coalesce(1).write.parquet(s"$srcDir/b")
    docsDf(allIds.drop(37)).coalesce(1).write.parquet(s"$srcDir/c")
    val q = TokenShardIngest.tokenShardIngestStream(
        EventsStream.readDocuments(spark, s"$srcDir/*",
          maxFilesPerTrigger = Some(1)),
        modelDir, storeDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(600000), "stream did not finish within 10 min")
    assert(new java.io.File(s"$storeDir/shards/batch=b2").exists(),
      "expected 3 streamed batches (b0..b2)")
    // the one-shot twin over everything
    Packer.writeTokenShardStore(
      LangModel.bpeEncodeWithModel(docsDf(allIds), model),
      rebuildDir, capacityTokens = 16, numGroups = 3, numShards = 2,
      seed = "e0")
    // epoch mixture (fractional keep, spans carried) + attention
    // inputs over BOTH stores: identical sequence populations under
    // the same seed draw the same epoch, arrays and all
    def epoch(dir: String) = Packer.attentionInputs(
        Packer.readTokenShardStoreMix(spark, Seq(dir -> 750000L),
          numShards = 2, seed = "ep1", withSpans = true))
      .select("store", "pass", "shard", "shard_pos", "pack_group",
        "seq_id", "n_tokens", "token_ids", "cu_seqlens", "position_ids")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getSeq[Int](7).mkString(","),
        r.getSeq[Long](8).mkString(","),
        r.getSeq[Long](9).mkString(","))).toSet
    val streamed = epoch(storeDir)
    assert(streamed === epoch(rebuildDir))
    assert(streamed.nonEmpty, "epoch mixture drew nothing — vacuous")
    // the attention arrays are real: every row's cu_seqlens ends at
    // n_tokens and position_ids has n_tokens entries
    streamed.foreach { case (_, _, _, _, _, _, nTok, _, cu, pos) =>
      assert(cu.split(',').last.toLong === nTok)
      assert(pos.split(',').length.toLong === nTok)
    }
  }
}

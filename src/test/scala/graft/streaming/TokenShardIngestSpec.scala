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
}

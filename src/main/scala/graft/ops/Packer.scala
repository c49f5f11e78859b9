package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to fixed-capacity
  * training bins (the "pack documents into 2k/4k-token sequences" step
  * of an LLM data pipeline) by running token count.
  *
  * Documents are first split into `numGroups` deterministic hash groups
  * (same salted-md5 arithmetic as [[Sampling.hashBucket]] — reproducible
  * on any engine); within a group, docs are packed in doc_id order: a
  * doc's bin is its exclusive running-token-offset divided by the
  * capacity, i.e. each doc lands in the bin where its first token would
  * fall when the group's docs are laid out back-to-back. A doc may
  * straddle a boundary — the contract of streaming concat-then-chunk
  * packing (chunk-level reshaping is [[Chunker.slidingWindows]]).
  *
  * Scale: the only shuffle is the group-local sort for the running sum;
  * groups are independent, so parallelism = numGroups — size it ≥ the
  * cluster's cores (the default here suits local[32]; at 100 TB pick
  * thousands, or a natural partition like (source, day)). No global
  * sort, no driver state. */
object Packer {

  def packSequences(docs: DataFrame, capacityTokens: Int = 256,
                    numGroups: Int = 32, textCol: String = "text",
                    salt: String = "pack"): DataFrame =
    packCounted(docs.select(col("doc_id"),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens")),
      capacityTokens, numGroups, salt)

  /** [[packSequences]] over EXPLICIT per-document token counts —
    * (doc_id, n_tokens) — instead of whitespace counts: the packing
    * step of a TOKENIZED pipeline, where lengths come from the
    * tokenizer actually shipping ([[graft.ops.LangModel.bpeEncode]]'s
    * n_tokens; whitespace counts drift badly from BPE lengths on
    * long/rare words). Identical grouping, ordering, and bin
    * arithmetic; identical output schema. */
  def packTokenized(counts: DataFrame, capacityTokens: Int = 256,
                    numGroups: Int = 32, salt: String = "pack"): DataFrame =
    packCounted(counts.select(col("doc_id"),
      col("n_tokens").cast("long").as("n_tokens")),
      capacityTokens, numGroups, salt)

  /** Materialized fixed-length training sequences — the relation a
    * trainer actually reads, where [[packTokenized]] stops at the
    * doc→bin map: each (pack_group, seq_id) row carries EXACTLY the
    * tokens of one capacity-sized window over the group's
    * concatenated-in-doc_id-order token stream, so a document
    * straddling a boundary is SPLIT at token level (the
    * concat-then-chunk contract). Input is [[graft.ops.LangModel
    * .bpeEncode]]'s schema (doc_id, token_ids, n_tokens); output
    * (pack_group, seq_id, token_ids, n_tokens), where only each
    * group's final sequence may be shorter than the capacity —
    * `dropRemainder = true` drops those (the training-shard
    * convention when partial sequences are not padded).
    * `docSpans = true` additionally emits `doc_spans`
    * (array<struct<doc_id, start, end>>, start-ascending, end
    * INCLUSIVE): the per-sequence document boundaries a trainer
    * rebuilds its block-diagonal attention mask from — packed
    * sequences concatenate unrelated documents, and attention must
    * not cross their boundaries.
    *
    * Scale shape: the doc→(group, offset) map is [[packTokenized]]
    * (one group-local sort per pack_group); placement is one token
    * explode joined against that doc-level map on doc_id (shuffle
    * keyed by doc id — never a global sort), and assembly is one
    * (pack_group, seq_id)-keyed aggregation whose groups are bounded
    * by the capacity. numGroups is the parallelism knob, as
    * documented on the object. `enc` is read TWICE (placement + the
    * doc→bin map): a persisted table pays two column-pruned scans; an
    * inline derivation (e.g. a fresh [[graft.ops.LangModel.bpeEncode]]
    * chain) should be staged by the caller first — ReuseExchange does
    * not survive the differing prunes (the q121 lesson). */
  def materializeTokenShards(enc: DataFrame, capacityTokens: Int = 256,
                             numGroups: Int = 32, salt: String = "pack",
                             dropRemainder: Boolean = false,
                             docSpans: Boolean = false): DataFrame = {
    val packed = packTokenized(enc.select(col("doc_id"), col("n_tokens")),
      capacityTokens, numGroups, salt)
    val toks = enc.select(col("doc_id"),
      posexplode(col("token_ids")).as(Seq("tpos", "token_id")))
    val placed = toks
      .join(packed.select("doc_id", "pack_group", "bin_offset"), Seq("doc_id"))
      .select(col("pack_group"),
        expr(s"(bin_offset + tpos) div $capacityTokens").as("seq_id"),
        pmod(col("bin_offset") + col("tpos"), lit(capacityTokens.toLong))
          .as("pos_in_seq"),
        col("token_id"), col("doc_id"))
    val seqs = placed.groupBy("pack_group", "seq_id")
      .agg(sort_array(collect_list(
        struct(col("pos_in_seq"), col("token_id"), col("doc_id")))).as("tt"))
      // per-sequence document boundaries, start-ascending: the
      // block-diagonal attention mask a trainer rebuilds from a
      // concat-then-chunk shard (attention must not cross document
      // boundaries inside a packed sequence). tt is pos-sorted and a
      // doc's tokens are consecutive by the placement arithmetic, so
      // spans fall out of the doc-change BOUNDARIES: __si collects the
      // 0-based indices where tt's doc_id differs from its
      // predecessor (one O(1) element_at per position — the 1-based
      // element_at(tt, i) IS the predecessor of 0-based i), and each
      // span runs from its boundary to just before the next. O(n)
      // total where the r13 per-doc filter() rescans were
      // O(n · docs_per_seq) — the one quadratic expression the r13
      // verdict flagged (capacity-bounded, but needlessly so).
      .withColumn("__si", expr(
        """filter(transform(tt, (x, i) ->
             if(i = 0, i,
                if(element_at(tt, i).doc_id != x.doc_id, i, -1))),
           v -> v >= 0)"""))
      .select(col("pack_group"), col("seq_id"),
        expr("transform(tt, x -> x.token_id)").as("token_ids"),
        size(col("tt")).cast("long").as("n_tokens"),
        // span k: starts at tt[si[k]] (element_at is 1-based: si[k] is
        // the k-th 0-based boundary, so tt element si[k]+1); ends at
        // the element just before the NEXT boundary — 1-based index
        // si[k+1] — or at the sequence's last element. End inclusive.
        expr("""transform(__si, (s, k) -> named_struct(
              'doc_id', element_at(tt, s + 1).doc_id,
              'start', element_at(tt, s + 1).pos_in_seq,
              'end', element_at(tt,
                if(k + 2 <= size(__si), element_at(__si, k + 2), size(tt))
              ).pos_in_seq))""")
          .as("doc_spans"))
    val withSpans = if (docSpans) seqs else seqs.drop("doc_spans")
    if (dropRemainder) withSpans.where(col("n_tokens") === capacityTokens)
    else withSpans
  }

  /** Deterministic pseudorandom shuffle of packed training sequences
    * into `numShards` reader shards — the "global shuffle before
    * training" step: [[materializeTokenShards]] emits sequences in
    * (pack_group, seq_id) order, which is doc_id order, which is
    * corpus order — and corpus order is crawl order, so a trainer
    * reading shards sequentially would see a topical/temporal
    * curriculum nobody asked for. Every sequence gets a shuffle key =
    * salted-md5(seed | pack_group | seq_id) (the [[Sampling
    * .hashBucket]] arithmetic — reproducible on any engine, and a new
    * `seed` is a fresh epoch-order for free); its shard is the key mod
    * `numShards`, its position within the shard is ascending key
    * (ties by (pack_group, seq_id) — unreachable for md5-128 but
    * pinned anyway so the contract is total).
    *
    * Scale shape: one hash projection + ONE shard-keyed exchange with
    * an in-shard sort — no global sort, no driver state. Each shard
    * sorts within one task, which is exactly the training-shard
    * contract: a shard IS the unit one reader consumes, so size
    * `numShards` to the reader fleet (thousands at 100 TB), never to
    * the corpus. Output = input columns + (shard, shard_pos). */
  def shuffleSequences(seqs: DataFrame, numShards: Int = 32,
                       seed: String = "shuffle"): DataFrame = {
    require(numShards > 0, s"numShards ($numShards) must be positive")
    val key = graft.functions.TextExpressions.md5_lower64(
        concat(lit(seed), lit("|"), col("pack_group").cast("string"),
          lit("|"), col("seq_id").cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    val w = Window.partitionBy("shard")
      .orderBy(col("__skey"), col("pack_group"), col("seq_id"))
    seqs.withColumn("__skey", key)
      .withColumn("shard", pmod(col("__skey"), lit(numShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .drop("__skey")
  }

  /** Persist the trainer-facing SHARD STORE — the artifact the whole
    * curate → select → tokenize → pack → shuffle pipeline exists to
    * produce, in the layout a reader fleet mounts:
    *
    *  - `dir/shards/shard=<n>/` — one directory per reader shard
    *    (shard_pos, pack_group, seq_id, token_ids, n_tokens
    *    [, doc_spans]), the [[shuffleSequences]] order;
    *  - `dir/manifest` — (shard, n_sequences, n_tokens), derived by
    *    READING BACK the written files, so the manifest can never
    *    disagree with them (a manifest computed from the input plan
    *    would silently mask a partial write);
    *  - `dir/params` — (capacity_tokens, num_shards, seed, salt,
    *    drop_remainder, doc_spans): the facts a reader must not have
    *    to guess, validated by [[readTokenShardStore]] with the
    *    [[graft.ops.LangModel.loadBpeModel]] refusal convention.
    *
    * Overwrite semantics: re-running a crashed write replaces it (the
    * per-relation overwrite is the idempotent-replay contract every
    * store here uses). `dropRemainder` defaults TRUE here — a
    * persisted training shard is consumed by fixed-shape readers. */
  def writeTokenShardStore(enc: DataFrame, dir: String,
                           capacityTokens: Int = 256, numGroups: Int = 32,
                           numShards: Int = 32, seed: String = "shuffle",
                           salt: String = "pack",
                           dropRemainder: Boolean = true,
                           docSpans: Boolean = true): Unit = {
    val spark = enc.sparkSession
    val seqs = materializeTokenShards(enc, capacityTokens, numGroups, salt,
      dropRemainder, docSpans)
    shuffleSequences(seqs, numShards, seed)
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$dir/shards")
    // the hive partition column reads back as int — pin long so the
    // manifest and reader schemas match shuffleSequences' output
    spark.read.parquet(s"$dir/shards")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_sequences"),
        sum("n_tokens").cast("long").as("n_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    import spark.implicits._
    Seq((capacityTokens, numShards, seed, salt, dropRemainder, docSpans))
      .toDF("capacity_tokens", "num_shards", "seed", "salt",
        "drop_remainder", "doc_spans")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  /** Open a [[writeTokenShardStore]] directory. `expectCapacity` /
    * `expectShards` ≥ 0 refuse a store written with different sizing
    * (a reader fleet wired for 4k-token sequences must not silently
    * consume 2k ones). Returns the shards relation; one shard's rows
    * ordered by shard_pos ARE its training order. */
  def readTokenShardStore(spark: org.apache.spark.sql.SparkSession,
                          dir: String, expectCapacity: Int = -1,
                          expectShards: Int = -1): DataFrame = {
    val p = spark.read.parquet(s"$dir/params")
      .select("capacity_tokens", "num_shards").head()
    require(expectCapacity < 0 || p.getInt(0) == expectCapacity,
      s"readTokenShardStore: store at $dir was written at " +
        s"capacity ${p.getInt(0)}, caller expects $expectCapacity — " +
        "refusing a mismatched shard store")
    require(expectShards < 0 || p.getInt(1) == expectShards,
      s"readTokenShardStore: store at $dir holds ${p.getInt(1)} shards, " +
        s"caller expects $expectShards — refusing a mismatched shard store")
    spark.read.parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
  }

  private def packCounted(counts: DataFrame, capacityTokens: Int,
                          numGroups: Int, salt: String): DataFrame = {
    require(capacityTokens > 0 && numGroups > 0,
      s"capacityTokens ($capacityTokens) and numGroups ($numGroups) must be positive")
    val grouped = counts.select(
      col("doc_id"), col("n_tokens"),
      pmod(graft.functions.TextExpressions.md5_lower64(
          concat(lit(salt), lit("|"), col("doc_id").cast("string")))
        .bitwiseAND(lit(Long.MaxValue)), lit(numGroups.toLong)).as("pack_group"))
    val w = Window.partitionBy("pack_group").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    grouped
      .withColumn("bin_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("pack_group"),
        (col("bin_offset") / capacityTokens).cast("long").as("bin_id"),
        col("n_tokens"), col("bin_offset"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / probe-many MinHash-LSH near-duplicate index — the text
  * analogue of [[Similarity.buildIvfIndex]], and the serving shape a
  * 100 TB corpus actually uses for ingest dedup and decontamination.
  *
  * [[Dedup.crossNearDuplicates]] re-shingles, re-hashes, and re-bands
  * BOTH corpora on every call; fine when each side is seen once, wrong
  * for the recurring flows — "does today's shard duplicate three years
  * of history?" (ingest dedup) and "does this corpus overlap the frozen
  * eval suite?" (decontamination) — where one side is immutable across
  * thousands of calls. The index persists that side's derived relations
  * once:
  *
  *  - `dir/bands`   — (doc_id, band_id, band_hash): the LSH bucket keys,
  *  - `dir/shingles`— (doc_id, sh): the 64-bit shingle-hash sets the
  *    exact-Jaccard verification needs (payloads stay longs, never
  *    strings — same reasoning as [[Dedup.jaccardVerify]]),
  *  - `dir/meta`    — one row of LSH parameters, validated on every
  *    probe/append so an index can never be served with mismatched
  *    hashing (silently-zero recall otherwise).
  *
  * A probe batch then computes its own bands/shingles scan-locally (the
  * native [[graft.functions.TextExpressions.ShingleMinHash]] projection
  * — no shuffle) and joins the persisted relations: candidate cost is
  * ∝ batch + matched index rows, never ∝ corpus. Both join sides carry
  * digests, so the shuffles are skew-free; when the batch is small the
  * planner broadcasts it against the index's bare parquet scans (real
  * file statistics — nothing here hides them behind a barrier). New
  * corpus shards [[append]] in place: the derived relations are
  * row-wise functions of each doc, so append ≡ rebuild (spec-asserted).
  *
  * Results are bit-identical to [[Dedup.crossNearDuplicates]] over the
  * same two corpora (same candidate generation, same verification
  * payloads, same rounding) — the index changes WHERE the corpus-side
  * work happens (once, at build), not what is computed.
  */
object LshIndex {

  /** LSH parameters pinned at build time. */
  final case class Params(numHashes: Int, rowsPerBand: Int, shingleSize: Int)

  private def bandsOf(docs: DataFrame, textCol: String, p: Params): DataFrame =
    Dedup.lshBands(
      Dedup.minHashSignatures(docs, textCol, p.numHashes, p.shingleSize),
      p.numHashes, p.rowsPerBand)

  private def shinglesOf(docs: DataFrame, textCol: String, p: Params): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextExpressions.shingle_hashes(
        TextStats.tokens(col(textCol)), p.shingleSize).as("sh"))

  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit = {
    import spark.implicits._
    Seq((p.numHashes, p.rowsPerBand, p.shingleSize))
      .toDF("num_hashes", "rows_per_band", "shingle_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** The parameters an index was built with. */
  def params(spark: SparkSession, dir: String): Params = {
    val r = spark.read.parquet(s"$dir/meta").head()
    Params(r.getAs[Int]("num_hashes"), r.getAs[Int]("rows_per_band"),
      r.getAs[Int]("shingle_size"))
  }

  /** Build the index: ONE pass over the corpus (signatures, bands, and
    * shingle hashes are all scan-local projections of the same read)
    * writing the two derived relations plus the parameter row.
    *
    * Layout: each ingest unit lands in its own `shard=<id>` partition
    * subdirectory (the build is `shard=base`), so an [[append]] is an
    * OVERWRITE of one shard directory — deterministic shard ids make
    * re-running a failed append (or a replayed streaming batch, see
    * [[graft.streaming.IngestStream]]) idempotent instead of
    * row-duplicating, the same per-batch-subdir contract the streaming
    * sinks use. Probes read the parent dir; the shard column is
    * provenance, never content. */
  def build(corpus: DataFrame, dir: String, textCol: String = "text",
            numHashes: Int = 8, rowsPerBand: Int = 2,
            shingleSize: Int = 3): Unit = {
    val p = Params(numHashes, rowsPerBand, shingleSize)
    writeMeta(corpus.sparkSession, dir, p)
    bandsOf(corpus, textCol, p)
      .write.mode("overwrite").parquet(s"$dir/bands/shard=base")
    shinglesOf(corpus, textCol, p)
      .write.mode("overwrite").parquet(s"$dir/shingles/shard=base")
  }

  /** Append a new corpus shard — the daily-ingest maintenance step.
    * Bands and shingle sets are per-doc functions, so appending shard
    * rows is EXACTLY rebuilding over the union (spec-asserted); only
    * the shard is scanned. Parameters must match the build (an index
    * probed with different hashing has silently-zero recall — refuse
    * loudly instead). Re-running the SAME shardId replaces that shard
    * (idempotent); distinct ingest units must use distinct ids, and the
    * caller owns doc_id uniqueness across shards, as everywhere in the
    * dedup family. */
  def append(shard: DataFrame, dir: String, textCol: String = "text",
             shardId: String = java.util.UUID.randomUUID().toString): Unit = {
    require(shardId.nonEmpty && shardId != "base" &&
      shardId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"shardId '$shardId' must be a non-'base' [A-Za-z0-9_-]+ token")
    val p = params(shard.sparkSession, dir)
    bandsOf(shard, textCol, p)
      .write.mode("overwrite").parquet(s"$dir/bands/shard=$shardId")
    shinglesOf(shard, textCol, p)
      .write.mode("overwrite").parquet(s"$dir/shingles/shard=$shardId")
  }

  /** Probe: every (probe doc, index doc) near-duplicate pair at or above
    * `threshold` exact n-gram Jaccard. Output (doc_id, index_doc_id,
    * jaccard·1e-4-rounded) — the [[Dedup.crossNearDuplicates]] contract
    * with the index side second.
    *
    * Plan shape: the probe batch's bands/shingles are scan-local; the
    * index sides are bare parquet scans (candidates join on
    * (band_id, band_hash), verification on the two doc ids — all
    * digest-or-id keys, no text payloads anywhere). The corpus is
    * never re-shingled: the only ShingleMinHash/ShingleHashes in the
    * plan sit over the probe batch (spec-asserted).
    *
    * `excludeShards`: shard ids whose rows the probe must not see — a
    * PARTITION filter, so excluded shards' files are never even listed.
    * The load-bearing use is replay safety ([[graft.streaming
    * .IngestStream]]): a replayed batch already appended (part of) its
    * own survivors as `batch-<id>`, and probing without excluding that
    * shard would find the batch duplicating ITSELF and drop every row. */
  def nearDuplicates(probe: DataFrame, dir: String, threshold: Double = 0.5,
                     textCol: String = "text",
                     excludeShards: Seq[String] = Nil): DataFrame = {
    val spark = probe.sparkSession
    val p = params(spark, dir)
    def shardFilter(df: DataFrame): DataFrame =
      if (excludeShards.isEmpty) df
      else df.where(!col("shard").isin(excludeShards: _*))
    val idxBands = shardFilter(spark.read.parquet(s"$dir/bands"))
    val idxSh = shardFilter(spark.read.parquet(s"$dir/shingles"))
    val cand = bandsOf(probe, textCol, p).alias("q")
      .join(idxBands.alias("x"),
        col("q.band_id") === col("x.band_id") &&
        col("q.band_hash") === col("x.band_hash"))
      .select(col("q.doc_id").as("doc_id"), col("x.doc_id").as("index_doc_id"))
      .distinct()
    cand
      .join(shinglesOf(probe, textCol, p)
        .select(col("doc_id"), col("sh").as("sh_q")), "doc_id")
      .join(idxSh.select(col("doc_id").as("index_doc_id"), col("sh").as("sh_x")),
        "index_doc_id")
      .withColumn("jaccard",
        graft.functions.TextExpressions.array_jaccard(col("sh_q"), col("sh_x")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("index_doc_id"),
        round(col("jaccard"), 4).as("jaccard"))
  }
}

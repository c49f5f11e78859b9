package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline a 100 TB corpus run
  * composes from this engine's operators:
  *
  *   exact dedup → MinHash-LSH near-dup removal → quality gate
  *
  * Every stage is one of the individually-verified operators; the
  * composition itself is also oracle-checked (q39). Stage order is
  * deliberate: exact dedup first (cheapest, biggest volume cut at web
  * scale), LSH on what remains, the per-document quality scoring last so
  * it runs on the smallest set.
  */
object Curation {

  final case class Params(shingleSize: Int = 2, numHashes: Int = 8,
                          rowsPerBand: Int = 2, jaccardThreshold: Double = 0.35,
                          minQuality: Double = 0.7)

  /** Curated corpus: per-document stats for survivors of both dedup
    * stages with quality_score ≥ minQuality. */
  def curate(docs: DataFrame, params: Params = Params()): DataFrame = {
    val keepers = Dedup.exactDedupedCorpus(docs)
    // LSH runs on the exact-dedup survivors only: any near-dup pair
    // involving a dropped exact-duplicate is represented by its keeper
    // (identical content ⇒ identical shingles), so the loser set over
    // keepers is the same — without re-hashing the duplicates.
    val nearDupLosers = Dedup.nearDuplicates(keepers,
        numHashes = params.numHashes, rowsPerBand = params.rowsPerBand,
        shingleSize = params.shingleSize, threshold = params.jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val surviving = keepers.join(nearDupLosers, Seq("doc_id"), "left_anti")
    TextStats.statsFor(surviving)
      .where(col("quality_score") >= params.minQuality)
      .select("doc_id", "n_chars", "n_tokens", "quality_score", "lang_pred")
  }
}

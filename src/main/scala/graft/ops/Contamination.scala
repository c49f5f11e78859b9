package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for each corpus document, the
  * fraction of its word n-gram shingles that appear anywhere in a
  * benchmark/eval set. High overlap flags train-test leakage — a
  * first-class gate in any LLM training-data pipeline.
  *
  * Scale design (corpus ~100 TB, benchmark ~MBs — eval sets are small):
  *  - the benchmark's distinct shingle-hash universe is tiny → broadcast;
  *  - the corpus side is ONE hash pass: project shingle hashes, explode,
  *    broadcast-inner-join against the benchmark universe — the join
  *    filters to hits *before* any exchange, so the only shuffled rows
  *    are actual contamination hits (rare by construction), partially
  *    aggregated map-side;
  *  - docs with zero hits are restored by a final left join against a
  *    bare (doc_id) projection — a second corpus scan, but one that
  *    reads a single column and does no hashing.
  * Shingles are carried as 64-bit md5-derived hashes (engine-portable,
  * see [[graft.functions.TextExpressions.ShingleHashes]]), never as
  * strings. */
object Contamination {

  /** Distinct shingle-hash universe of the benchmark set. */
  def shingleUniverse(bench: DataFrame, textCol: String = "text",
                      shingleSize: Int = 3): DataFrame =
    hashed(bench, textCol, shingleSize)
      .select(explode(col("sh")).as("h"))
      .distinct()

  /** (doc_id, sh: array<long>) behind a generator barrier: explode of a
    * single-element array evaluates the hash expression exactly once per
    * row. Without it, InferFiltersFromGenerate clones the expression
    * into the generator's inferred size()/isnotnull() filter and the
    * md5 pass runs up to 3× per row (same idiom, same reason as
    * [[Dedup.minHashSignatures]]). */
  private def hashed(docs: DataFrame, textCol: String,
                     shingleSize: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(array(graft.functions.TextExpressions.shingle_hashes(
        TextStats.tokens(col(textCol)), shingleSize))).as("sh"))

  /** Per-document contamination: (doc_id, n_shingles, n_contaminated,
    * contamination ∈ [0,1]). Docs with no shingles (shorter than the
    * shingle size) are excluded — 0/0 has no meaningful score. */
  def score(corpus: DataFrame, bench: DataFrame, textCol: String = "text",
            shingleSize: Int = 3): DataFrame = {
    val universe = shingleUniverse(bench, textCol, shingleSize)
    val exploded = hashed(corpus, textCol, shingleSize)
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val hits = exploded.join(broadcast(universe), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"))
    // restore zero-hit docs; the denominator comes from shingle_count —
    // the distinct-HASH count (collision-consistent with the universe
    // join and the oracle's list_distinct-of-hashes), scalar so no array
    // materializes and no generator-inferred filter can clone it
    val totals = corpus.select(col("doc_id"),
        explode(array(graft.functions.TextExpressions.shingle_count(
          TextStats.tokens(col(textCol)), shingleSize))).as("n_shingles"))
      .where(col("n_shingles") > 0)
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_shingles"), 4)
          .as("contamination"))
  }

  /** Exact contamination hit-list (docs sharing >= 1 shingle with the
    * benchmark, with their true distinct-hit count) behind a Bloom
    * pre-gate — the scale path when the benchmark shingle universe is
    * too large to broadcast as rows (a few GBs of hashes): the universe
    * is folded into an ~MB Bloom sketch via a distributed treeAggregate
    * (df.stat.bloomFilter), shipped to every scan as a binary literal,
    * and probed by Spark's native BloomFilterMightContain BEFORE any
    * exchange — so the verify join shuffles only true hits plus the fpp
    * sliver of false positives, not every corpus shingle. The verify
    * join (no broadcast hint; AQE picks the strategy) restores
    * exactness: output is identical to the broadcast-universe path. */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame,
                         textCol: String = "text", shingleSize: Int = 3,
                         fpp: Double = 0.01): DataFrame = {
    val universe = shingleUniverse(bench, textCol, shingleSize)
    // sizing pass over the (benchmark-sized, small) universe only
    val nItems = math.max(universe.count(), 1L)
    val bf = universe.stat.bloomFilter("h", nItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val probe = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(bos.toByteArray)),
        ColumnBridge.expression(col("h"))))
    val exploded = hashed(corpus, textCol, shingleSize)
      .select(col("doc_id"), explode(col("sh")).as("h"))
    exploded.where(probe)
      .join(universe, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Cross-source overlap matrix: for every pair of sources, how many
    * distinct shingle hashes they share and the Jaccard similarity of
    * their shingle sets. The corpus-composition diagnostic of a
    * multi-source training mix — two crawls of the same sites, a dump
    * and its filtered re-release, or a benchmark hiding inside a web
    * source all show up as an off-diagonal spike long before per-doc
    * dedup would find them.
    *
    * Scale: ONE corpus hash pass and ONE corpus shuffle — rows group by
    * the shingle HASH (uniform digest keys, no skew) into a sorted
    * per-hash source set (≤ |sources| elements, dozens), and the pair
    * expansion is a LOCAL nested transform over that set: Σ_h
    * C(sources_per_shingle, 2) output rows, bounded by the source
    * count, never a corpus×corpus self-join. Per-source set sizes
    * explode off the same grouped relation (AQE reuses the exchange —
    * both consumers hang off the identical shuffle), and the final
    * matrix is sources² rows — tiny. */
  def sourceOverlap(docs: DataFrame, sourceCol: String = "source",
                    textCol: String = "text",
                    shingleSize: Int = 3): DataFrame = {
    // generator barrier (same idiom/reason as [[hashed]]): evaluate the
    // hash expression once per row, then fan out
    val sh = docs.select(col(sourceCol).as("src"),
        explode(array(graft.functions.TextExpressions.shingle_hashes(
          TextStats.tokens(col(textCol)), shingleSize))).as("sh"))
      .select(col("src"), explode(col("sh")).as("h"))
    val byHash = sh.groupBy("h")
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
    val pairs = byHash
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
             transform(slice(srcs, i + 2, size(srcs)),
                       y -> struct(x AS src_a, y AS src_b))))""")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    val sizes = byHash.select(explode(col("srcs")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(sizes.select(col("src").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("src").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 6)
          .as("jaccard"))
  }
}

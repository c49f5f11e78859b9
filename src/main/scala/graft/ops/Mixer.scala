package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source token-budget mixture sampling: the "mixture weights" step
  * of training-data assembly. Each source contributes documents — in a
  * deterministic pseudo-random priority order — until its token budget
  * is exhausted; the kept set is the exact prefix of the per-source
  * (priority, doc_id) order whose running token total fits the budget.
  *
  * Scale design: the naive formulation is one running-sum window
  * partitioned by source — but a 100 TB corpus has FEW sources, so that
  * window serializes each source through one task. Instead, selection
  * runs in two phases on ordered priority buckets (top bits of the
  * 63-bit priority hash):
  *   1. per-(source, bucket) token sums (map-side-combined shuffle of
  *      #sources × 1024 rows) + a prefix sum over that tiny relation
  *      give each bucket its cumulative-tokens-before;
  *   2. buckets wholly under budget keep every row with NO row-level
  *      window; only the single boundary bucket per source (~1/1024 of
  *      its rows) pays the ordered running sum.
  * Both phases shuffle the corpus once (the broadcast of bucket bounds
  * is #sources × 1024). The result is bit-identical to the naive
  * window — a spec asserts it.
  */
object Mixer {

  private val NumBuckets = 1024
  // 63-bit priority → top 10 bits form the ordered bucket id
  private val BucketShift = 53

  private def withPriority(docs: DataFrame, idCol: String, sourceCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol), col(sourceCol),
      TextStats.tokenCount(col(textCol)).as("n_tokens"),
      graft.functions.TextExpressions.md5_lower64(
          concat(lit("budget|"), col(idCol).cast("string")))
        .bitwiseAND(Long.MaxValue).as("priority"))

  /** Documents kept under a uniform per-source token budget.
    * Output: (doc_id, source, n_tokens). */
  def tokenBudgetMix(docs: DataFrame, budget: Long,
                     idCol: String = "doc_id", sourceCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val base = withPriority(docs, idCol, sourceCol, textCol)
      .withColumn("bucket", shiftright(col("priority"), BucketShift).cast("int"))
    val byBucket = Window.partitionBy(sourceCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = base.groupBy(col(sourceCol), col("bucket"))
      .agg(sum("n_tokens").as("btoks"))
      .withColumn("cum_before", coalesce(sum("btoks").over(byBucket), lit(0L)))
    val joined = base.join(broadcast(bounds), Seq(sourceCol, "bucket"))
    val fullKeep = joined
      .where(col("cum_before") + col("btoks") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"))
    // <= so zero-token docs sitting exactly at an exhausted budget are
    // kept, matching the naive window's cum <= budget; at most one
    // bucket per source can satisfy this (btoks = 0 buckets under
    // budget are full-keeps, and later buckets start past the budget)
    val boundary = joined
      .where(col("cum_before") <= budget &&
        col("cum_before") + col("btoks") > budget)
    val byPriority = Window.partitionBy(sourceCol)
      .orderBy(col("priority"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeep = boundary
      .withColumn("row_cum", sum("n_tokens").over(byPriority))
      .where(col("cum_before") + col("row_cum") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"))
    fullKeep.union(boundaryKeep)
  }

  /** Reference formulation: one running-sum window per source. Identical
    * output; serializes each source through a single task at scale —
    * exists as the spec's equivalence oracle and the small-data path. */
  def tokenBudgetMixNaive(docs: DataFrame, budget: Long,
                          idCol: String = "doc_id", sourceCol: String = "source",
                          textCol: String = "text"): DataFrame = {
    val byPriority = Window.partitionBy(sourceCol)
      .orderBy(col("priority"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPriority(docs, idCol, sourceCol, textCol)
      .withColumn("cum", sum("n_tokens").over(byPriority))
      .where(col("cum") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"))
  }
}

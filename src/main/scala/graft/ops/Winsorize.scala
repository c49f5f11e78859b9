package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorized (percentile-clipped) group statistics — the outlier
  * treatment step of metric pipelines, in exact integer arithmetic.
  *
  * Percentile definition: rank-based (percentile_disc) — the bound for
  * percentile p over n rows is the value at sorted position ceil(n·p/100),
  * computed as (n·p + 99) div 100 in integer math. Interpolating
  * percentiles would put an engine-specific float expression in a
  * comparison (a + (b-a)·f vs a·(1-f) + b·f differ in ulps); value-at-rank
  * keeps bounds, comparisons, and sums all in the integer domain, so the
  * result is bit-identical on any engine.
  *
  * Scale shape: the per-group sort that a window-rank formulation needs
  * (one task per group — serial at 100 TB) is replaced by a value
  * HISTOGRAM: aggregate to (group, value) counts, run the cumulative sum
  * over that much smaller relation, pick each bound as the least value
  * whose cumulative count reaches the rank, broadcast the per-group
  * bounds back, and clip in a final scan-local aggregate. Two shuffles
  * on (group, value) and (group); the corpus itself is scanned twice
  * (histogram + clip), never sorted.
  */
object Winsorize {

  /** Per-group winsorized stats of an integer-valued column.
    * Output: (group, n, lo_cents, hi_cents, win_sum_cents,
    * clipped_lo, clipped_hi). */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCents: Column,
                      pLo: Int = 5, pHi: Int = 95): DataFrame = {
    require(0 < pLo && pLo < pHi && pHi <= 100, s"bad percentile pair ($pLo, $pHi)")
    val base = df.select(col(groupCol), valueCents.as("cents"))
    val hist = base.groupBy(groupCol, "cents").agg(count(lit(1)).as("cnt"))
    val cdf = hist.withColumn("cum",
      sum("cnt").over(Window.partitionBy(groupCol).orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val bounds = cdf
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
      .groupBy(col(groupCol), col("n"))
      .agg(
        min(when(col("cum") >= expr(s"(n * $pLo + 99) div 100"), col("cents")))
          .as("lo_cents"),
        min(when(col("cum") >= expr(s"(n * $pHi + 99) div 100"), col("cents")))
          .as("hi_cents"))
    base.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol), col("n"), col("lo_cents"), col("hi_cents"))
      .agg(
        sum(greatest(least(col("cents"), col("hi_cents")), col("lo_cents")))
          .as("win_sum_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("clipped_lo"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("clipped_hi"))
  }
}

package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling: one row per profiled column with row,
  * null, and exact distinct counts plus stringified min/max — the
  * "what is actually in this table" report that precedes any pipeline
  * onboarding, in long format so it lands in one relation regardless
  * of the table's width or types.
  *
  * Scale: ALL columns profile in a single aggregation pass. The
  * multi-column exact distinct counts plan as one Expand (rows ×
  * (cols+1)) feeding partially-aggregated shuffles — one scan, no
  * per-column jobs; the unpivot to long format is a scan-free stack
  * over the single aggregated row. Min/max are cast to string so
  * heterogeneous column types coexist in one output schema (callers
  * pre-cast types whose rendering is engine-specific, e.g. timestamp →
  * date, double → decimal).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // names are interpolated into the stack() expression string — reject
    // anything that could parse as something else
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"column name '$c' is not a plain identifier; alias it first"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate shapes that actually reach the parquet reader — shared by
  * the point-lookup serving paths ([[LshIndex.pointNearDuplicates]],
  * [[Pq.ivfPqTopKRefinedPoint]]). */
object Pushdown {

  /** An `IN (...)` predicate parquet can push at ANY value count:
    * Spark converts an In to a parquet filter only up to
    * `spark.sql.parquet.pushdown.inFilterThreshold` values (default
    * 10; beyond it only a [min,max] range is pushed — vacuous for
    * scattered keys), but an OR of ≤ threshold-sized Ins converts
    * clause by clause. Built as a BALANCED tree (a left-assoc reduce
    * over hundreds of chunks would nest as deep as the chunk count).
    * Row-group stat evaluation of the clauses is nanoseconds against
    * the megabytes each skipped group would have cost; the per-ROW
    * residual evaluation is why point paths cap their key counts and
    * fall back to the full-scan join beyond it. */
  def pushedIsin(c: Column, values: Seq[Any], chunk: Int = 10): Column = {
    def orTree(cs: Seq[Column]): Column =
      if (cs.length == 1) cs.head
      else orTree(cs.grouped(2).map(_.reduce(_ || _)).toSeq)
    if (values.isEmpty) lit(false)
    else orTree(values.grouped(chunk).map(g => c.isin(g: _*)).toSeq)
  }
}

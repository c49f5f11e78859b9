package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark lacks
  * natively. Composed from built-ins (SURVEY.md §7.3 preference (a)):
  * union both sides, one window pass per partition key carrying the last
  * right-side row forward.
  *
  * Scale: exactly one shuffle+sort on (partition key, time) — no join
  * explosion, no per-row range probe. This is the plan a custom
  * SparkStrategy would produce anyway, so no custom node is needed.
  */
object AsOf {

  /** For each left row, attach the latest right row whose `timeCol` is
    * ≤ the left row's, within `partitionCols`. Right value columns come
    * back `asof_`-prefixed (plus `asof_<timeCol>`); unmatched left rows
    * keep nulls (left-outer semantics).
    *
    * Right-side (partition, time) duplicates must be resolved by the
    * caller (e.g. keep max id) — as-of is otherwise ill-defined. */
  def asofJoin(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               timeCol: String, rightValueCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((timeCol +: rightValueCols).map(col): _*)
    // a null right time would sort first (nulls-first) with a non-null
    // payload struct and become a bogus "match"; it can never satisfy
    // time <= left-time, so drop it up front
    val rightClean = right.where(col(timeCol).isNotNull)
    val r = rightClean.select(
      (partitionCols.map(col) :+ col(timeCol).as("__t") :+
        payload.as("__payload") :+ lit(0).as("__side")): _*)
    val l = left.select(
      (leftCols.map(col) :+ col(timeCol).as("__t") :+
        lit(null).cast(r.schema("__payload").dataType).as("__payload") :+
        lit(1).as("__side")): _*)
    // align schemas: right side lacks the non-partition left columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("__t") :+ col("__payload") :+ col("__side")): _*)
    val unioned = rAligned.unionByName(l)
    // right rows sort before left rows at equal time → "at or before"
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val outCols = leftCols.map(col) ++
      ((timeCol +: rightValueCols).map(c => col(s"__m.$c").as(s"$prefix$c")))
    matched.select(outCols: _*)
  }
}

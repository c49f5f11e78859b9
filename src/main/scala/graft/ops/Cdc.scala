package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an ordered changelog of
  * upserts/deletes into the latest table state. This is the materialize
  * step of every incremental ingestion path — the reference pipeline's
  * monthly full-rebuild (dag_immigration schedules whole-table
  * overwrites) becomes, at daily/hourly cadence, "apply the day's
  * changelog to yesterday's snapshot" — and the same collapse is the
  * batch twin of streaming upsert sinks.
  *
  * Contract: `log` has the key column(s), a total-order sequence column
  * (commit LSN / event id — ties broken deterministically by `opCol`
  * descending so a delete+insert at the same sequence resolves the same
  * way on every engine), an op column with 'D' marking deletes (anything
  * else is an upsert), and the payload columns. Output: the surviving
  * latest payload per key, changelog columns dropped.
  *
  * Scale: one shuffle on the key, then a per-key linear scan for the
  * window — rows per key is bounded by the changelog's churn per key,
  * not the corpus. `row_number` (not `max_by` over a struct) so the
  * payload may contain maps/arrays, which struct-max ordering would
  * reject; the filter keeps exactly one row per key before anything
  * downstream sees the data.
  */
object Cdc {

  def applyChangelog(log: DataFrame, keys: Seq[String], seqCol: Column,
                     opCol: Column, deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "applyChangelog: need at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCol.desc, opCol.desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !(opCol === lit(deleteOp)))
      .drop("__rn")
  }

  /** Keys whose LATEST changelog entry is a delete — the removal set an
    * incremental merge must anti-join against its previous snapshot
    * (a key [[applyChangelog]] merely omits from this batch could still
    * exist from an earlier one). Same single-shuffle window. */
  def deletedKeys(log: DataFrame, keys: Seq[String], seqCol: Column,
                  opCol: Column, deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "deletedKeys: need at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCol.desc, opCol.desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && (opCol === lit(deleteOp)))
      .select(keys.map(col): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge: the versioned-dimension
  * maintenance step of a warehouse load. The reference pipeline rebuilds
  * its dimensions from scratch every run (data_preparation.py overwrites
  * dim_* wholesale); SCD2 is the incremental-history counterpart a
  * production load of the same star schema would run — keep every
  * historical attribute version, with validity intervals, and only touch
  * keys present in today's batch.
  *
  * Contract: `current` is the existing dimension with `key`, the tracked
  * attribute columns, and bookkeeping columns `effective_from: DATE`,
  * `effective_to: DATE` (null = open), `is_current: BOOLEAN`. `updates`
  * carries `key` + the same tracked columns (one row per key — enforce
  * upstream with [[Cdc.applyChangelog]] if the batch is a changelog).
  *
  * Semantics (exactly the textbook type-2 merge):
  *   - closed history rows (is_current = false) pass through untouched;
  *   - a current row whose key is absent from the batch, or whose
  *     tracked attributes are all unchanged (null-safe comparison),
  *     passes through untouched;
  *   - a current row whose attributes changed is CLOSED: effective_to =
  *     batchDate, is_current = false — and the batch row is INSERTED
  *     open (effective_from = batchDate, effective_to = null);
  *   - a batch key unseen in `current` is inserted open the same way.
  *
  * Scale: ONE equi-join on the dimension key decides everything — each
  * joined row then emits its 1-2 output rows (kept / closed+reopened /
  * inserted) through a single generate, so the join is never
  * re-evaluated per disposition branch (a naive three-way
  * union-of-filters re-runs the join three times; at dimension scale
  * that is three shuffles for one). The batch side of a dimension load
  * is small relative to the dimension, so AQE broadcasts whichever
  * side fits. Null-safe change detection is `<=>` so a null→value
  * transition versions correctly.
  */
object Scd {

  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
                tracked: Seq[String], batchDate: Column): DataFrame = {
    require(tracked.nonEmpty, "scd2Merge: need at least one tracked column")
    val bookkeeping = Seq("effective_from", "effective_to", "is_current")
    val outCols = (Seq(key) ++ tracked ++ bookkeeping).map(col)

    val closed = current.where(!col("is_current"))
    val open = current.where(col("is_current"))

    // one row per batch key, tagged with whether it differs from the
    // open version (null-safe on every tracked column)
    val upd = updates.select((Seq(key) ++ tracked).map(c => col(c).as(s"u_$c")): _*)
    val joined = open.join(upd, col(key) === col(s"u_$key"), "full_outer")
    val changed = tracked.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)

    def named(k: Column, attrs: Seq[Column], from: Column, to: Column,
              cur: Column): Column =
      struct((k.as(key) +: attrs.zip(tracked).map { case (c, n) => c.as(n) }) ++
        Seq(from.as("effective_from"), to.as("effective_to"),
          cur.as("is_current")): _*)

    val kept = named(col(key), tracked.map(col),
      col("effective_from"), col("effective_to"), col("is_current"))
    val closedNow = named(col(key), tracked.map(col),
      col("effective_from"), batchDate.cast("date"), lit(false))
    val inserted = named(col(s"u_$key"), tracked.map(c => col(s"u_$c")),
      batchDate.cast("date"), lit(null).cast("date"), lit(true))

    val emitted = when(col(key).isNull, array(inserted))          // new key
      .when(col(s"u_$key").isNull || !changed, array(kept))       // untouched
      .otherwise(array(closedNow, inserted))                      // versioned
    joined.select(explode(emitted).as("r")).select(col("r.*"))
      .unionByName(closed.select(outCols: _*))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; salting
  * is the explicit, planner-independent form for when one key dominates a
  * shuffle: the big side spreads each key over `numSalts` sub-keys
  * (derived deterministically from a spreading column, so results are
  * reproducible), and the small side replicates each row `numSalts`
  * times. Join output is identical to the unsalted join; the shuffle's
  * largest partition shrinks by ~numSalts×.
  */
object Skew {

  /** Equi-join `big ⨝ small` on `key`, salted. `spreadCol` is any
    * big-side column with per-row variety (an id) used to derive the
    * deterministic salt. Only inner/left joins are valid: under right or
    * full-outer, an unmatched replicated small-side row would surface
    * once per salt. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreadCol: String, numSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(right/full would duplicate unmatched small-side rows per salt)")
    val salted = big.withColumn("__salt", pmod(hash(col(spreadCol)), lit(numSalts)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

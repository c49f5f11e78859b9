package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q86 degradation path under user-key skew: when the event volume
  * outgrows the broadcast threshold, `assignSessions`' bucket join
  * degrades (by design) to a shuffled SortMergeJoin on
  * (user_id, __bucket) — this spec plants one user holding ~50% of all
  * events and proves the two properties that keep that path healthy at
  * 100 TB:
  *
  *  1. the INTERVAL side is bounded per join key BY CONSTRUCTION:
  *     sessions of one user are separated by ≥ gap = bucketWidth, so at
  *     most two sessions can overlap any single bucket — the join can
  *     never go quadratic in the hot user's row count, whatever the
  *     skew (this is the structural bound; AQE is the belt on top);
  *  2. AQE's skew-join split actually fires on the hot point-side
  *     partition (SortMergeJoin(skew=true) in the final adaptive plan),
  *     so the hot user's rows fan across tasks instead of serializing
  *     through one.
  */
class RangeJoinSkewSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600L * 1000L * 1000L

  /** ~67% of events on user 0 within 20 MINUTES — a single gap-width
    * bucket, so the whole hot load hashes to ONE (user, bucket) shuffle
    * key: the worst case for the join (a spread-out hot user already
    * fans across bucket keys; a burst inside one bucket cannot be
    * hash-split and needs AQE). The rest spreads over 2000 users and a
    * month. */
  private def skewedEvents = {
    val hot = spark.range(100000).select(
      col("id").as("event_id"),
      lit(0L).as("user_id"),
      // 100k events across 20 minutes -> one gap-width bucket
      (lit(1700000000L) * 1000000L + col("id") * (HourUs / 3 / 100000))
        .multiply(1000L).as("ts"),
      lit(0.5).as("value"))
    val cold = spark.range(50000).select(
      (col("id") + 1000000L).as("event_id"),
      (col("id") % 2000L + 1L).as("user_id"),
      (lit(1700000000L) * 1000000L + col("id") * (720 * HourUs / 50000))
        .multiply(1000L).as("ts"),
      lit(0.5).as("value"))
    hot.unionByName(cold)
  }

  test("assignSessions under 50%-one-user skew: SMJ + AQE skew split, interval side bounded") {
    val events = skewedEvents
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      // force the degraded (non-broadcast) path and scale AQE's skew
      // thresholds down to test-data volume (defaults are 256 MB-class)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")

      val assigned = RangeJoin.assignSessions(events)
      // execute THIS DataFrame's own query execution (collect, not
      // count — count builds a separate QueryExecution whose adaptive
      // plan would finalize instead of this one's): AQE finalizes and
      // skew-splits at runtime
      assert(assigned.collect().length === 150000)
      val plan = assigned.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ degradation, plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "bucket decomposition must keep an equi-join under skew")
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire on the hot partition, plan:\n$plan")

      // the structural bound: ≤ 2 sessions overlap any (user, bucket)
      val gapUs = 30L * 60L * 1000L * 1000L
      val maxPerKey = Events.sessionize(events)
        .select(col("user_id"),
          explode(sequence(col("session_start_us") divide gapUs cast "long",
                           col("session_end_us") divide gapUs cast "long")).as("bucket"))
        .groupBy("user_id", "bucket").agg(count(lit(1)).as("n"))
        .agg(max("n")).head.getLong(0)
      assert(maxPerKey <= 2L,
        s"interval side must stay ≤2 per (user,bucket) — gap-separated sessions; got $maxPerKey")

      // and the skewed run is still CORRECT: per-session counts match
      val fromAssign = assigned.groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"))
      val fromSessions = Events.sessionize(events)
        .select("user_id", "session_seq", "n_events")
      assert(fromAssign.except(fromSessions).isEmpty &&
        fromSessions.except(fromAssign).isEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}

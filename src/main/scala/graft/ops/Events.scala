package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (the streaming twin lives in
  * graft.streaming). `ts` is epoch-nanos (LongType — see GraftSession's
  * nanosAsLong) so bucket math is pure integer arithmetic: deterministic,
  * portable, codegen'd.
  */
object Events {

  val NanosPerHour: Long = 3600L * 1000L * 1000L * 1000L

  /** Tumbling-window aggregate: events per (hour, event_type) with count,
    * exact value cents, distinct users. One shuffle on the bucket key. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's 2^53
      // exact range, so float division would misplace bucket edges
      .groupBy(expr(s"ts div ${NanosPerHour}L").as("hour_idx"),
               col("event_type"))
      .agg(
        count(lit(1)).as("event_cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        countDistinct(col("user_id")).as("distinct_users"))
      .withColumn("hour_start_epoch_s", col("hour_idx") * 3600)

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapMinutes`. lag → gap flag → running sum = session id;
    * all three windows share one partitioning (user_id) so Spark plans a
    * single shuffle + sort.
    *
    * Times are in microseconds (`ts div 1000` from the raw nanos) — the
    * highest precision every engine in the toolchain round-trips. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000L * 1000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val withGap = events
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** JSON extraction from the props column (`{"k": 87}`-shaped). */
  def propsKey(props: Column): Column =
    get_json_object(props, "$.k").cast("int")
}

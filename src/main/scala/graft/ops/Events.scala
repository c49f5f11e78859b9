package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-stream analytics in batch form (the streaming twin lives in
  * graft.streaming). Internally `ts` is epoch-nanos (LongType) so bucket
  * math is pure integer arithmetic: deterministic, portable, codegen'd.
  * [[withTsNanos]] adapts whatever physical type the source carries.
  */
object Events {

  val NanosPerHour: Long = 3600L * 1000L * 1000L * 1000L

  /** Normalize the `ts` column to epoch-nanos LongType regardless of the
    * source's physical annotation. Two shapes exist in the wild:
    * INT64 TIMESTAMP(NANOS), which Spark surfaces as Long under
    * `spark.sql.legacy.parquet.nanosAsLong` (passes through), and
    * TIMESTAMP(MICROS) / TIMESTAMP_NTZ, which converts exactly via
    * `unix_micros` (the cast interprets NTZ wall-time in the session
    * zone — pinned UTC in GraftSession, matching how the micros data is
    * written). Scan-local projection: no shuffle, stays in codegen.
    * Any OTHER physical type (string, double, date…) throws here, at
    * the point of use — a silent cast would flow nulls/garbage through
    * every events query; the TestdataSchemaSpec canary only guards the
    * checked-in fixture at test time. */
  def withTsNanos(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType => events
      case TimestampType | TimestampNTZType => events.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other — expected " +
          "INT64 epoch-nanos or TIMESTAMP(_NTZ); extend Events.withTsNanos " +
          "if the testdata schema changed again")
    }

  /** Tumbling-window aggregate: events per (hour, event_type) with count,
    * exact value cents, distinct users. One shuffle on the bucket key. */
  def hourlyAgg(events: DataFrame): DataFrame =
    withTsNanos(events)
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
    val withGap = withTsNanos(events)
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

  /** Ordered conversion funnel: how many users performed the stages in
    * sequence (each stage's first qualifying event must not precede the
    * previous stage's). Output: (stage_idx, stage, users).
    *
    * Scale shape: each stage is one filtered scan + a user-keyed
    * aggregate, joined to the *previous* stage's per-user relation — the
    * relations shrink monotonically down the funnel, every join keys on
    * user_id (uniform), and nothing is collected: counts are scalar
    * aggregates unioned at the end. No per-user event lists are ever
    * materialized (the collect_list alternative holds a user's whole
    * history in one row — unbounded at 100 TB). */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("view", "click", "purchase"))
  : DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = withTsNanos(events)
    // fold: per-user first-reach time of each stage, ordered
    val first = ev.where(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("ts")).as("reach_ts"))
    val perStage = stages.tail.scanLeft(first) { (prev, st) =>
      ev.where(col("event_type") === st).select(col("user_id"), col("ts"))
        .join(prev.select(col("user_id"), col("reach_ts").as("prev_ts")), "user_id")
        .where(col("ts") >= col("prev_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("reach_ts"))
    }
    val counts = perStage.zip(stages.zipWithIndex).map { case (df, (st, i)) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"), col("users"))
    }
    counts.reduce(_.unionAll(_))
  }

  val NanosPerWeek: Long = 7L * 24L * NanosPerHour

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event; each (cohort_week, week_offset) cell counts the
    * cohort's users active that week. Classic growth-analytics matrix.
    *
    * Scale shape: the cohort relation is a user-keyed aggregate of the
    * scan; the activity relation is a distinct over (user, week) — both
    * shuffle once on user_id, so the equi-join between them reuses the
    * same hash partitioning; the final cell aggregate is
    * bounded-cardinality (weeks × weeks). */
  def retention(events: DataFrame): DataFrame = {
    val wk = s"ts div ${NanosPerWeek}L"
    val ev = withTsNanos(events)
    val cohort = ev.groupBy("user_id")
      .agg(min(expr(wk)).as("cohort_week"))
    val active = ev.select(col("user_id"), expr(wk).as("week_idx")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week_idx") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Dense hourly series with gap fill: every (event_type, hour) cell in
    * the corpus's global hour range, event_cnt = 0 where nothing
    * happened and the hourly value sum carried forward from the last
    * observed hour (nulls before the first observation).
    *
    * Scale shape: the global hour range is a 1-row scalar aggregate
    * (broadcast cross join); densification is a scan-local
    * `sequence(...)` generate per type — series length is time-bounded
    * (hours elapsed), not data-bounded, so the per-type forward-fill
    * window partitions are bounded regardless of corpus size. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = hourlyAgg(events)
      .select(col("event_type"), col("hour_idx"), col("event_cnt"), col("value_cents"))
    val range = hourly.agg(min("hour_idx").as("min_h"), max("hour_idx").as("max_h"))
    val types = hourly.select("event_type").distinct()
    val dense = types.crossJoin(broadcast(range))
      .select(col("event_type"), explode(expr("sequence(min_h, max_h)")).as("hour_idx"))
    val w = Window.partitionBy("event_type").orderBy("hour_idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    dense.join(hourly, Seq("event_type", "hour_idx"), "left")
      .select(col("event_type"), col("hour_idx"),
        coalesce(col("event_cnt"), lit(0L)).as("event_cnt"),
        last(col("value_cents"), ignoreNulls = true).over(w).as("filled_cents"))
  }

  /** Per-type z-score anomaly flags over the event value, computed from
    * exact integer moments so the gate is engine-portable: with n, S=Σx,
    * SS=Σx² over integer cents, z = (n·x − S)/√(n·SS − S²), and
    * |z| > `sigmas` ⇔ (n·x − S)² > sigmas²·(n·SS − S²) — a pure
    * integer comparison (decimal(38,0): n·SS ~ 1e9·(1e5)² overflows
    * BIGINT long before 100 TB). The reported z_scaled =
    * round(z·1e4) is derived from the same exact integers.
    *
    * Scale shape: one scan for the per-type moments (bounded: one row
    * per event_type, broadcast back), one scan for the flags — the
    * filter is scan-local after the broadcast join. */
  def anomalies(events: DataFrame, sigmas: Int = 3): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val stats = events
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(cents).cast("decimal(38,0)").as("s"),
        sum(cents * cents).cast("decimal(38,0)").as("ss"))
    events.select(col("event_id"), col("event_type"), cents.as("value_cents"))
      .join(broadcast(stats), "event_type")
      .withColumn("num", col("n") * col("value_cents") - col("s"))
      .withColumn("den2", col("n") * col("ss") - col("s") * col("s"))
      .where(col("num") * col("num") > lit(sigmas * sigmas) * col("den2"))
      .select(col("event_id"), col("event_type"), col("value_cents"),
        round(col("num").cast("double") / sqrt(col("den2").cast("double")) * 1e4)
          .cast("long").as("z_scaled"))
  }
}

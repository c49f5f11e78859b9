package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private val H = Events.NanosPerHour
  private val M = 60L * 1000L * 1000L * 1000L   // ns per minute

  private lazy val events = Seq(
    // user 1: two sessions separated by a 45-minute gap
    (1L, 10L * M, 1L, "click", 1.0, """{"k": 1}"""),
    (2L, 20L * M, 1L, "click", 2.0, """{"k": 2}"""),
    (3L, 80L * M, 1L, "purchase", 3.5, """{"k": 3}"""),
    // user 2: single session crossing an hour boundary
    (4L, 55L * M, 2L, "click", 1.25, """{"k": 4}"""),
    (5L, 65L * M, 2L, "click", 0.75, """{"k": 5}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("withTsNanos: unsupported physical ts type fails at the point of use") {
    // the silent-cast hazard from round 7's schema regeneration: a
    // string/double ts must throw here, not flow nulls through every
    // downstream events query
    val bad = Seq((1L, "2026-01-01 00:00:00")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Events.withTsNanos(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("hourly tumbling aggregate: correct buckets and exact cents") {
    val agg = Events.hourlyAgg(events).cache()
    val clickH0 = agg.where(col("hour_idx") === 0 && col("event_type") === "click").head()
    assert(clickH0.getAs[Long]("event_cnt") === 3)       // events at 10,20,55 min
    assert(clickH0.getAs[Long]("value_cents") === 425)   // 100+200+125
    assert(clickH0.getAs[Long]("distinct_users") === 2)
    assert(clickH0.getAs[Long]("hour_start_epoch_s") === 0)
    val h1 = agg.where(col("hour_idx") === 1).cache()
    assert(h1.count() === 2)                             // click + purchase in hour 1
  }

  test("sessionize: 30-minute gap splits sessions; times in microseconds") {
    val s = Events.sessionize(events).cache()
    val u1 = s.where(col("user_id") === 1).orderBy("session_seq").collect()
    assert(u1.length === 2)
    assert(u1(0).getAs[Long]("n_events") === 2)
    assert(u1(1).getAs[Long]("n_events") === 1)
    assert(u1(1).getAs[Long]("session_start_us") === 80L * M / 1000)
    val u2 = s.where(col("user_id") === 2).collect()
    assert(u2.length === 1)                              // 10-min gap keeps one session
    assert(u2.head.getAs[Long]("value_cents") === 200)   // 125 + 75
  }

  test("approx_count_distinct within 5% of exact on real events") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val rows = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx"),
           countDistinct(col("user_id")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("props JSON extraction") {
    val k = events.select(Events.propsKey(col("props")).as("k"))
      .collect().map(_.getInt(0)).toSeq
    assert(k === Seq(1, 2, 3, 4, 5))
  }

  test("funnel: stage order matters, stages shrink monotonically") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, 10L * M, 1L, "view", 0.0, "{}"),
      (2L, 20L * M, 1L, "click", 0.0, "{}"),
      (3L, 30L * M, 1L, "purchase", 0.0, "{}"),
      // u2's only click PRECEDES its view — counts for view, not click
      (4L, 40L * M, 2L, "click", 0.0, "{}"),
      (5L, 50L * M, 2L, "view", 0.0, "{}"),
      // u3 views then clicks, never purchases
      (6L, 10L * M, 3L, "view", 0.0, "{}"),
      (7L, 20L * M, 3L, "click", 0.0, "{}"),
      // u4 purchases without ever viewing — in no stage
      (8L, 10L * M, 4L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.funnel(ev).orderBy("stage_idx").collect()
    assert(rows.map(r => (r.getAs[String]("stage"), r.getAs[Long]("users"))).toSeq ===
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("retention: cohort = first-event week, offsets count active weeks") {
    val W = Events.NanosPerWeek
    val ev = Seq(
      // u1: cohort week 0, active weeks 0, 1, 2
      (1L, 0L, 1L, "click", 0.0, "{}"),
      (2L, W + 1L, 1L, "click", 0.0, "{}"),
      (3L, 2 * W + 5L, 1L, "click", 0.0, "{}"),
      // u2: cohort week 1, active weeks 1 only (two events, one week)
      (4L, W + 2L, 2L, "view", 0.0, "{}"),
      (5L, W + 3L, 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val cells = Events.retention(ev).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("active_users"))).toSet
    assert(cells === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("gap fill: dense hour range per type, zero counts, forward-filled value") {
    val ev = Seq(
      (1L, 0L * H + 1L, 1L, "click", 1.0, "{}"),      // hour 0, 100c
      (2L, 3L * H + 1L, 1L, "click", 2.0, "{}"),      // hour 3, 200c
      (3L, 2L * H + 1L, 2L, "purchase", 0.5, "{}")    // hour 2, 50c
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val g = Events.gapFillHourly(ev).cache()
    val click = g.where(col("event_type") === "click").orderBy("hour_idx").collect()
    assert(click.map(_.getAs[Long]("hour_idx")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(click.map(_.getAs[Long]("event_cnt")).toSeq === Seq(1L, 0L, 0L, 1L))
    assert(click.map(_.getAs[Long]("filled_cents")).toSeq === Seq(100L, 100L, 100L, 200L))
    val purch = g.where(col("event_type") === "purchase").orderBy("hour_idx").collect()
    assert(purch.map(_.getAs[Long]("event_cnt")).toSeq === Seq(0L, 0L, 1L, 0L))
    // nulls before the first observation, filled after
    assert(purch(0).isNullAt(purch(0).fieldIndex("filled_cents")))
    assert(purch(3).getAs[Long]("filled_cents") === 50L)
  }

  test("anomalies: planted outlier flagged, tight cluster passes") {
    val base = (1L to 20L).map(i => (i, i * M, i, "t", 0.10, "{}"))
    val ev = (base :+ ((99L, 21L * M, 99L, "t", 10.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flagged = Events.anomalies(ev).collect()
    assert(flagged.map(_.getAs[Long]("event_id")).toSeq === Seq(99L))
    assert(flagged.head.getAs[Long]("z_scaled") > 3L * 10000)
  }
}

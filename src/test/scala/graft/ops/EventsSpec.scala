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
}

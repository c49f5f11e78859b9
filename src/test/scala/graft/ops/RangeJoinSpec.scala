package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed containment join matches the brute-force non-equi join") {
    val points = Seq(
      ("u1", 1L, 5L), ("u1", 2L, 95L), ("u1", 3L, 150L), ("u1", 4L, 250L),
      ("u2", 5L, 95L), ("u2", 6L, 400L)
    ).toDF("user_id", "event_id", "p")
    val intervals = Seq(
      ("u1", 10L, 0L, 100L),    // spans multiple buckets at w=30
      ("u1", 11L, 100L, 200L),  // bound-inclusive: p=150 inside, p=100 on edge
      ("u1", 12L, 90L, 99L),    // overlapping interval: p=95 matches two
      ("u2", 20L, 95L, 95L)     // degenerate single-point interval
    ).toDF("user_id", "iv_id", "s", "e")
    for (w <- Seq(1L, 7L, 30L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
          Seq("user_id"), w)
        .select("event_id", "iv_id")
        .as[(Long, Long)].collect().toSet
      val want = points.alias("p").join(intervals.alias("i"),
          $"p.user_id" === $"i.user_id" && $"p" >= $"s" && $"p" <= $"e")
        .select($"event_id", $"iv_id")
        .as[(Long, Long)].collect().toSet
      assert(got === want, s"width $w")
      assert(want.contains((2L, 10L)) && want.contains((2L, 12L))) // overlap kept
      assert(want.contains((5L, 20L)))                             // degenerate kept
    }
  }

  test("session assignment covers every event exactly once, consistent with sessionize") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val assigned = RangeJoin.assignSessions(events)
    assert(assigned.count() === events.count())
    assert(assigned.select("event_id").distinct().count() === events.count())
    // per-session event counts rebuilt from the assignment == sessionize's
    val fromAssign = assigned.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"))
    val fromSessions = Events.sessionize(events)
      .select("user_id", "session_seq", "n_events")
    assert(fromAssign.except(fromSessions).isEmpty && fromSessions.except(fromAssign).isEmpty)
  }
}

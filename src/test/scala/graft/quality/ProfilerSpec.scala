package graft.quality

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports rows, nulls, distincts, and string min/max per column") {
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(1.5)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(9.0))
    ).toDF("id", "s", "v")
    val p = Profiler.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") === ((4L, 0L, 4L, "1", "4")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
    assert(p("v")._1 === 4L)
    assert(p("v")._2 === 1L)
    assert(p("v")._3 === 3L)
  }

  test("profile of an empty table yields zero counts and null extrema") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = Profiler.profile(empty, Seq("id", "s")).collect()
    assert(p.length === 2)
    p.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via bucket decomposition.
  *
  * Spark has no native range-join operator: a bare
  * `points.join(intervals, p >= s && p <= e)` plans as a
  * broadcast-nested-loop (or worse, a cartesian) — O(|P|·|I|) work that
  * no amount of executors rescues at 100 TB. The classic fix is to
  * discretize time into fixed-width buckets: an interval [s, e] covers
  * buckets floor(s/w)..floor(e/w), a point p lives in exactly bucket
  * floor(p/w), and the containment join becomes an EQUI-join on
  * (equiKeys, bucket) plus a residual filter — hash-partitionable,
  * AQE-skew-splittable, broadcastable when one side is small.
  *
  * Cost model: the only blow-up is interval replication, bounded by
  * avg_interval_length / bucketWidth + 1 — pick w on the order of the
  * typical interval. Points are never replicated (one bucket each), so
  * no post-join dedup is needed: a (point, interval) match appears in
  * exactly one bucket, the point's own.
  */
object RangeJoin {

  /** Rows of `points` joined to every row of `intervals` with matching
    * `equiKeys` whose [startCol, endCol] contains pointCol (inclusive
    * bounds). Columns: equiKeys ++ point payload ++ interval payload.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      equiKeys: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div` (not double floor-division): exact for the full
    // 64-bit domain, and both sides derive buckets with the same op
    val pts = points.withColumn("__bucket",
      expr(s"`$pointCol` div ${bucketWidth}L"))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(expr(s"`$startCol` div ${bucketWidth}L"),
                       expr(s"`$endCol` div ${bucketWidth}L"))))
    pts.join(ivs, equiKeys :+ "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Session assignment: each event joined to the gap-based session
    * (Events.sessionize) that contains it — the range join whose
    * intervals the data itself induces. Bucket width = the session gap:
    * a session of n events spans at most (n·gap), so replication is
    * ≤ n_events per session while every event stays single-bucket.
    * Output: (event_id, user_id, session_seq). */
  def assignSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000L * 1000L
    val sessions = Events.sessionize(events, gapMinutes)
      .select("user_id", "session_seq", "session_start_us", "session_end_us")
    val points = Events.withTsNanos(events)
      .withColumn("ts_us", expr("ts div 1000L"))
      .select("event_id", "user_id", "ts_us")
    pointInInterval(points, sessions,
        "ts_us", "session_start_us", "session_end_us",
        equiKeys = Seq("user_id"), bucketWidth = gapUs)
      .select("event_id", "user_id", "session_seq")
  }
}

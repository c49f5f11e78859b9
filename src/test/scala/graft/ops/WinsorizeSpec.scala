package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("bounds are the rank-based percentiles; clipping sums in exact cents") {
    // group "a": 1..100 cents — p5 bound = 5, p95 bound = 95 (rank ceil(n*p/100))
    val a = (1 to 100).map(v => ("a", v.toLong))
    // group "b": ties + skew — values 10×4, 20×4, 1000×2; n=10,
    // k_lo=ceil(0.5)=1 → lo=10, k_hi=ceil(9.5)=10 → hi=1000
    val b = Seq.fill(4)(("b", 10L)) ++ Seq.fill(4)(("b", 20L)) ++ Seq.fill(2)(("b", 1000L))
    val df = (a ++ b).toDF("grp", "cents")
    val got = Winsorize.winsorizedStats(df, "grp", col("cents"))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val (_, na, loA, hiA, sumA, clA, chA) = got("a")
    assert((na, loA, hiA) === (100L, 5L, 95L))
    // winsorized sum: 4 values clipped up to 5, 5 values clipped down to 95
    val expectA = (1 to 100).map(v => math.min(math.max(v, 5), 95)).sum.toLong
    assert(sumA === expectA && clA === 4L && chA === 5L)
    val (_, nb, loB, hiB, sumB, clB, chB) = got("b")
    assert((nb, loB, hiB) === (10L, 10L, 1000L))
    assert(sumB === (4 * 10 + 4 * 20 + 2 * 1000).toLong && clB === 0L && chB === 0L)
  }

  test("single-value group degenerates to identity") {
    val df = Seq(("x", 7L), ("x", 7L)).toDF("grp", "cents")
    val r = Winsorize.winsorizedStats(df, "grp", col("cents"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === (("x", 2L, 7L, 7L, 14L, 0L, 0L)))
  }
}

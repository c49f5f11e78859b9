package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSkewSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest right row at-or-before each left time; left-outer") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 200L, 12.0),
                     ("B", 60L, 5.0))
      .toDF("sym", "t", "px")
    val out = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
      .orderBy("trade_id")
      .collect().map(r => (r.getAs[Long]("trade_id"),
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
    assert(out(0) === ((1L, Some(100L), Some(11.0))))   // equal time matches
    assert(out(1) === ((2L, Some(200L), Some(12.0))))   // latest before 205
    assert(out(2) === ((3L, None, None)))               // no quote ≤ 50 for B
  }

  test("salted join equals the plain join on skewed data") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 2 else 1, i))
      .toDF("k", "id")                                  // key 1 dominates
    val small = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "id", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", "id", numSalts = 8)
      .select("k", "id", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain)
    // left-outer keeps unmatched big rows exactly once
    val bigU = big.withColumn("k", when(col("id") === 7, 99).otherwise(col("k")))
    val lo = Skew.saltedJoin(bigU, small, "k", "id", 4, "left")
    assert(lo.where(col("name").isNull).count() === 1)
    assert(lo.count() === 2000)
  }
}

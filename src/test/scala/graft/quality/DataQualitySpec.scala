package graft.quality

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("passes on non-empty table with no nulls") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r = DataQuality.check(df, "t", "k")
    assert(r.passed && r.rows === 2 && r.nulls === 0)
  }

  test("fails on null values (reference ValueError contract)") {
    val df = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
    val e = intercept[IllegalStateException](DataQuality.check(df, "t", "k"))
    assert(e.getMessage.contains("null values"))
  }

  test("uniqueness gate: passes on unique, fails on duplicates") {
    val ok = Seq(1, 2, 3).toDF("k")
    DataQuality.checkUnique(ok, "t", "k")
    val dup = Seq(1, 2, 2).toDF("k")
    val e = intercept[IllegalStateException](DataQuality.checkUnique(dup, "t", "k"))
    assert(e.getMessage.contains("duplicate"))
  }

  test("foreign-key gate: nulls ignored, orphans fail") {
    val dim = Seq(1, 2).toDF("pk")
    val factOk = Seq(Some(1), Some(2), None).toDF("fk")
    DataQuality.checkForeignKey(factOk, "fk", dim, "pk", "fact", "dim")
    val factBad = Seq(Some(1), Some(9)).toDF("fk")
    val e = intercept[IllegalStateException](
      DataQuality.checkForeignKey(factBad, "fk", dim, "pk", "fact", "dim"))
    assert(e.getMessage.contains("missing"))
  }

  test("fails on empty table") {
    val df = spark.emptyDataFrame.withColumn("k", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalStateException](
      DataQuality.check(df.where("k > 1"), "t", "k"))
    assert(e.getMessage.contains("no results"))
  }
}

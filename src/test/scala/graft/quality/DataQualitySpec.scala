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

  test("fails on empty table") {
    val df = spark.emptyDataFrame.withColumn("k", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalStateException](
      DataQuality.check(df.where("k > 1"), "t", "k"))
    assert(e.getMessage.contains("no results"))
  }
}

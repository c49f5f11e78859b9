package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalWriteSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite replaces only the touched partition") {
    val out = Files.createTempDirectory("incr").toString + "/fact"
    val day1 = Seq((1, "2016-04-01", "a"), (2, "2016-04-02", "b"))
      .toDF("id", "day", "v")
    Io.writePartitioned(day1, out, "day")
    // re-process day 2 only, with corrected data
    val day2fix = Seq((3, "2016-04-02", "b2")).toDF("id", "day", "v")
    Io.overwritePartitions(day2fix, out, "day")
    val got = spark.read.parquet(out)
      // partition values are type-inferred (date here); normalize back
      .select(col("id"), col("day").cast("string").as("day"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    // day 1 untouched, day 2 replaced
    assert(got === Set((1, "2016-04-01", "a"), (3, "2016-04-02", "b2")))
  }
}

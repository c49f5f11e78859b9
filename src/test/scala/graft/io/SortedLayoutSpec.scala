package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeSorted produces disjoint per-file key ranges (the pruning contract)") {
    val out = Files.createTempDirectory("sorted").resolve("t").toString
    val df = (0L until 10000L).map(i => ((i * 7919) % 10000, s"p$i"))
      .toDF("k", "payload")                       // keys arrive unsorted
    Io.writeSorted(df, out, numFiles = 4, "k")

    // read-back equality
    val back = spark.read.parquet(out)
    assert(back.count() === 10000)
    assert(back.agg(sum("k")).head().getLong(0) ===
      df.agg(sum("k")).head().getLong(0))

    // per-file [min, max] intervals must not overlap: that is what makes
    // parquet footer stats selective for range predicates
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2,
        s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
    // range partitioning balances: no file holds the whole table
    assert(ranges.forall(_._3 < 10000))

    // a narrow range predicate only surfaces rows from one file
    val touched = back.where(col("k").between(100, 200))
      .select(input_file_name()).distinct().count()
    assert(touched === 1)
  }
}

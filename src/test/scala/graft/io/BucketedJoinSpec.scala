package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed tables must join with zero shuffle — the co-location story
  * for fact-to-fact joins at scale. */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previous JVM's in-memory catalog is gone but its files remain
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Io.writeBucketed(spark.read.parquet(s"$dir/orders.parquet"),
      "b_orders", numBuckets = 4, Seq("o_orderkey"))
    Io.writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet"),
      "b_lineitem", numBuckets = 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // shuffle nodes print as "Exchange hashpartitioning(...)"; broadcast
      // would be "BroadcastExchange" (disabled above anyway)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it still computes the right thing
      val total = joined.agg(sum("n")).head().getLong(0)
      assert(total === spark.read.parquet(s"$dir/lineitem.parquet").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

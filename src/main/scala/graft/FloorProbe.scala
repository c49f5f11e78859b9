package graft

/** Dev probe: where does the ~0.8s/query bench floor come from?
  * Runs one representative join+agg query repeatedly under different
  * configs and prints timings. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("floor-probe")
    val dir = "/root/testdata/sf0.1"
    val fn = SparkEntry.queries("q03_orders_by_segment")
    def time(label: String): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    time("warm, AQE on ")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // probe a raw query too, to separate query-path overhead from the
    // underlying plan cost (tune() is idempotent and won't reset confs)
    val raw = (s: org.apache.spark.sql.SparkSession) => {
      import org.apache.spark.sql.functions._
      s.read.parquet(s"$dir/orders.parquet")
        .join(broadcast(s.read.parquet(s"$dir/customer.parquet")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"))
    }
    def timeRaw(label: String): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        raw(spark).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    timeRaw("raw, AQE off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    timeRaw("raw, AQE on ")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    timeRaw("raw, AQE on, 8 parts")
    spark.stop()
  }
}

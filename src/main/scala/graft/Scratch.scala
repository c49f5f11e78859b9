package graft

/** Dev-only exploration main (forked JVM, proper add-opens). Not part of
  * the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    def time(name: String, n: Int = 4): Unit = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // flagship smoke (driver contract: rows > 0 on sf0.001)
    val entryRows = SparkEntry.entry(spark).count()
    println(s"entry: $entryRows rows")
    assert(entryRows > 0, "entry() returned no rows")
    // warm the session on something cheap first
    time("q03_orders_by_segment")
    args.foreach(a => time(a))
    spark.stop()
  }
}

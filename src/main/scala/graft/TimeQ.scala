package graft

/** Dev-only: wall-time one or more SparkEntry queries in a single JVM,
  * three runs each (run 1 = cold JIT/caches, runs 2-3 = the warm price
  * a bench pass sees), with the same between-run block drop as Bench.
  * `dev/run.sh graft.TimeQ <sfDir> <query> [query...]` — the fast way
  * to localize one query's cost without a 6-minute bench sweep. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    args.drop(1).foreach { name =>
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"$name run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}

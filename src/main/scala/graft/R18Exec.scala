package graft

/** Dev capture (round 18): the FINAL adaptive (executed) plan of a
  * declared query — `explain` shows the initial plan only; join
  * adjudication needs what AQE actually ran. */
object R18Exec {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("r18-exec")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"\n========== $name (executed) ==========")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}

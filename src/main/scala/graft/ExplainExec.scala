package graft
// Dev-only: print the post-execution (AQE-final) plan of one query.
object ExplainExec {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ExplainExec <sfDir> <query>")
    val spark = GraftSession.local("explain-exec")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    println(plan.toString.take(9000))
    spark.stop()
  }
}

package graft

/** Dev scratchpad: flagship-entry smoke (the skill contract — expect 5
  * region rows); repurpose locally for plan inspection as needed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println("rows=" + df.count())
    spark.stop()
  }
}

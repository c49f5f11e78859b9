package graft

/** Dev-only exploration main (forked JVM, proper add-opens). Not part of
  * the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val e = SparkEntry.entry(spark)
    println("=== entry() result ===")
    e.show(10, truncate = false)
    println(s"entry rows: ${e.count()}")
    spark.stop()
  }
}

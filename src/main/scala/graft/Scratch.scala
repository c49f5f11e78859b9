package graft

/** Dev-only exploration main (forked JVM, proper add-opens). Not part of
  * the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val e = SparkEntry.entry(spark)
    println("=== entry() result ===")
    e.show(10, truncate = false)

    // drive the streaming surface end-to-end: file source → windowed agg
    // with watermark → memory sink, availableNow
    import org.apache.spark.sql.streaming.Trigger
    // the streaming file source wants a directory; stage the single-file
    // testdata table into one
    val srcDir = java.nio.file.Files.createTempDirectory("events-src").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val stream = streaming.EventsStream.readEvents(spark, srcDir)
    val q = streaming.EventsStream.hourlyAggStream(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("=== streaming hourly agg (first 5 rows, of " +
      spark.table("hourly").count() + ") ===")
    spark.table("hourly").orderBy("hour_idx", "event_type").show(5)

    // streaming exact dedup over a staged documents dir
    val docsDir = java.nio.file.Files.createTempDirectory("docs-src").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .coalesce(1).write.mode("overwrite").parquet(docsDir)
    val dq = streaming.EventsStream.dedupStream(
        streaming.EventsStream.readDocuments(spark, docsDir))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    dq.awaitTermination(120000)
    println("=== streaming dedup kept " + spark.table("dedup").count() +
      " of 500 docs ===")
    spark.stop()
  }
}

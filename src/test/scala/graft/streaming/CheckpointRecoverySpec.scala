package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Exactly-once file-sink semantics across restarts: a second run over
  * the same checkpoint must pick up only new input and never duplicate
  * already-committed output. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint processes only new files, no duplicates") {
    val root = Files.createTempDirectory("ckpt").toString
    val src = s"$root/src"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    def run(): Unit = {
      val q = EventsStream.readEvents(spark, s"$src/*")
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(600000), "stream did not finish within 10 min (loaded host)")
    }
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.where(col("event_id") < 500).coalesce(1).write.parquet(s"$src/a")
    run()
    assert(spark.read.parquet(sink).count() === 500)
    // new data arrives; the restarted query resumes from the checkpoint
    ev.where(col("event_id") >= 500).coalesce(1).write.parquet(s"$src/b")
    run()
    val out = spark.read.parquet(sink)
    assert(out.count() === 1000)
    assert(out.select("event_id").distinct().count() === 1000)   // exactly once
  }
}

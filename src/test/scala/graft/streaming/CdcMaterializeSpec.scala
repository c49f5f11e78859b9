package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Cdc

/** The streaming CDC sink must converge to exactly what the batch
  * applyChangelog produces over the full log. */
class CdcMaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("cdcMaterialize converges to the batch applyChangelog of the whole log") {
    val dir = Files.createTempDirectory("cdc").toString
    val snap = s"$dir/snapshot"
    // batch 1: keys 1..3 upserted, key 2 then deleted
    Seq((1L, 10L, "U", "a1"), (2L, 11L, "U", "b1"), (3L, 12L, "U", "c1"),
      (2L, 13L, "D", ""))
      .toDF("k", "seq", "op", "payload").coalesce(1)
      .write.parquet(s"$dir/src/b1")
    val stream1 = spark.readStream
      .schema("k LONG, seq LONG, op STRING, payload STRING")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src/*")
    val q1 = EventsStream.cdcMaterialize(stream1, snap,
        Seq("k"), "seq", "op")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val afterB1 = spark.read.parquet(snap)
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(afterB1 === Set((1L, "a1"), (3L, "c1")))

    // batch 2 arrives later: key 1 updated, key 3 deleted, key 4 new,
    // key 2 re-inserted after its batch-1 delete
    Seq((1L, 20L, "U", "a2"), (3L, 21L, "D", ""), (4L, 22L, "U", "d1"),
      (2L, 23L, "U", "b2"))
      .toDF("k", "seq", "op", "payload").coalesce(1)
      .write.parquet(s"$dir/src/b2")
    val q2 = EventsStream.cdcMaterialize(
        spark.readStream
          .schema("k LONG, seq LONG, op STRING, payload STRING")
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/src/*"),
        snap, Seq("k"), "seq", "op")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val got = spark.read.parquet(snap)
      .select("k", "payload").as[(Long, String)].collect().toSet
    val fullLog = spark.read.parquet(s"$dir/src/*")
    val want = Cdc.applyChangelog(fullLog, Seq("k"), col("seq"), col("op"))
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, "a2"), (2L, "b2"), (4L, "d1")))
  }

  test("a crash between the swap renames is repaired at the next batch") {
    val dir = Files.createTempDirectory("cdc-crash").toString
    val snap = s"$dir/snapshot"
    Seq((1L, 10L, "U", "a1"), (2L, 11L, "U", "b1"))
      .toDF("k", "seq", "op", "payload").coalesce(1)
      .write.parquet(s"$dir/src/b1")
    val q1 = EventsStream.cdcMaterialize(
        spark.readStream
          .schema("k LONG, seq LONG, op STRING, payload STRING")
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/src/*"),
        snap, Seq("k"), "seq", "op")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()

    // simulate the mid-swap crash: snapshot renamed away, not yet replaced
    val fs = new org.apache.hadoop.fs.Path(snap)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(snap),
      new org.apache.hadoop.fs.Path(snap + "__cdc_old")))
    assert(!new java.io.File(snap).exists())

    // next batch must restore the parked snapshot BEFORE merging — key 1
    // from batch 1 must survive even though batch 2 never mentions it
    Seq((2L, 20L, "U", "b2")).toDF("k", "seq", "op", "payload").coalesce(1)
      .write.parquet(s"$dir/src/b2")
    val q2 = EventsStream.cdcMaterialize(
        spark.readStream
          .schema("k LONG, seq LONG, op STRING, payload STRING")
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/src/*"),
        snap, Seq("k"), "seq", "op")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val got = spark.read.parquet(snap)
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a1"), (2L, "b2")))
    assert(!new java.io.File(snap + "__cdc_old").exists())
  }
}

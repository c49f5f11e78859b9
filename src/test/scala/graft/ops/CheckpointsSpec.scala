package graft.ops

import graft.SparkSpec

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("reliable truncator installs, reuses, and switches the checkpoint dir correctly") {
    val base = java.nio.file.Files.createTempDirectory("graft-ckspec")
    val dirA = s"$base/a"
    val dirB = s"$base/a-sibling"   // shares dirA as a STRING prefix
    // install A and checkpoint through it
    val ckA = Checkpoints.truncator(spark, Some(dirA))
    ckA(Seq((1L, "x")).toDF("id", "v")).collect()
    def pathOf(s: String) =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val setA = spark.sparkContext.getCheckpointDir.get
    assert(pathOf(setA).startsWith(dirA + "/"),
      s"checkpoint dir $setA not under requested $dirA")
    // re-requesting A must NOT reset (same parent ⇒ keep the leaf)
    Checkpoints.truncator(spark, Some(dirA))
    assert(spark.sparkContext.getCheckpointDir.get === setA)
    // requesting the string-prefix SIBLING must actually switch — a
    // bare startsWith comparison would wrongly treat a-sibling's
    // request as already satisfied by a/ (or vice versa)
    val ckB = Checkpoints.truncator(spark, Some(dirB))
    val setB = spark.sparkContext.getCheckpointDir.get
    assert(pathOf(setB).startsWith(dirB + "/"),
      s"checkpoint dir $setB not switched under $dirB")
    assert(setB !== setA)
    // and the new dir receives the checkpoints
    ckB(Seq((2L, "y")).toDF("id", "v")).collect()
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dirB))
      .findAny().isPresent, "no checkpoint data under the switched dir")
  }
}

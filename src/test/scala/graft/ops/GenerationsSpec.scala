package graft.ops

import graft.SparkSpec

/** The CURRENT-pointer protocol's crash windows: a generation is
  * served only after its writer finished it (the `_GRAFT_GEN_COMPLETE`
  * marker), the no-CURRENT fallback skips half-written generations,
  * and the documented single-writer recovery — re-run setCurrent — is
  * idempotent. */
class GenerationsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A minimal "generation": one tiny parquet relation under gen-n. */
  private def writeGen(dir: String, n: Int): Unit =
    Seq((n, s"gen$n")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/gen-$n/rel")

  private def deleteCurrent(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, Generations.CurrentFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  test("root follows CURRENT; flat dirs resolve to themselves") {
    val dir = tmpDir("graft-gen")
    writeGen(dir, 0); writeGen(dir, 1)
    Generations.setCurrent(spark, dir, "gen-0")
    assert(Generations.root(spark, dir) == s"$dir/gen-0")
    val flat = tmpDir("graft-gen-flat")
    assert(Generations.root(spark, flat) == flat)
  }

  test("no CURRENT: fallback serves the newest COMPLETE generation, " +
       "skipping a half-written newer one") {
    val dir = tmpDir("graft-gen")
    writeGen(dir, 0)
    Generations.setCurrent(spark, dir, "gen-0")
    // a compaction wrote gen-1's relations but crashed BEFORE its
    // setCurrent (no marker); a second fault lost CURRENT too
    writeGen(dir, 1)
    deleteCurrent(dir)
    assert(Generations.root(spark, dir) == s"$dir/gen-0",
      "unmarked gen-1 must not be served")
    // once the compaction completes (marker + pointer), gen-1 serves
    Generations.setCurrent(spark, dir, "gen-1")
    deleteCurrent(dir)
    assert(Generations.root(spark, dir) == s"$dir/gen-1",
      "marked newest generation must be served without CURRENT")
  }

  test("no CURRENT, no markers (pre-marker layout): newest generation") {
    val dir = tmpDir("graft-gen")
    writeGen(dir, 0); writeGen(dir, 1)
    assert(Generations.root(spark, dir) == s"$dir/gen-1")
  }

  test("writer crash recovery: re-running setCurrent is idempotent") {
    val dir = tmpDir("graft-gen")
    writeGen(dir, 0)
    Generations.setCurrent(spark, dir, "gen-0")
    // crash window: CURRENT deleted, rename never ran
    deleteCurrent(dir)
    Generations.setCurrent(spark, dir, "gen-0") // the recovery step
    assert(Generations.root(spark, dir) == s"$dir/gen-0")
    Generations.setCurrent(spark, dir, "gen-0") // and again — no-op
    assert(Generations.root(spark, dir) == s"$dir/gen-0")
  }

  test("a versioned LSH index with CURRENT lost still serves correctly") {
    val corpus = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs today"))
      .toDF("doc_id", "text")
    val probe = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft-gen-lsh")
    LshIndex.buildVersioned(corpus, dir, shingleSize = 2)
    val withCurrent = LshIndex.nearDuplicates(probe, dir, threshold = 0.3)
      .collect().toSet
    deleteCurrent(dir)
    val withoutCurrent = LshIndex.nearDuplicates(probe, dir, threshold = 0.3)
      .collect().toSet
    assert(withCurrent == withoutCurrent && withCurrent.nonEmpty,
      "the complete newest generation must serve identically in the gap")
  }
}

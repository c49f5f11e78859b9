package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Driver-loss restart for the iterative batch operators: a run that
  * dies after committing round k's state must be resumable by a fresh
  * invocation — picking up at round k+1, not replaying 1..k — with
  * bit-identical final output. The "kill" is simulated by a run bounded
  * to k rounds: observationally identical to a driver death at the
  * round-k barrier, since [[Restart.save]]'s rename commit is the last
  * thing a round does. */
class RestartSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A 40-node path graph: CC needs several alternating-star rounds
    * (diameter-heavy), PageRank ranks are non-uniform. */
  private def pathEdges = (0L until 39L).map(i => (i, i + 1))

  test("connectedComponents resumes mid-loop from restartDir, output bit-identical") {
    val pairs = pathEdges.toDF("doc_a", "doc_b")
    val dir = tmpDir("graft-cc-restart")
    // the doomed run: dies (maxIter exhausted) after committing 2 rounds
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, maxIter = 2, smallCutoff = 0L,
        restartDir = Some(dir))
    }
    val committed = new java.io.File(dir).list().filter(_.startsWith("round=")).sorted
    assert(committed.sameElements(Array("round=1", "round=2")))
    val round1Mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "round=1"))

    // resume in a FRESH session (shares the JVM context, but reads the
    // state solely through parquet — nothing of the doomed run's plans
    // or caches is reachable from it)
    val spark2 = spark.newSession()
    val pairs2 = {
      import spark2.implicits._
      pathEdges.toDF("doc_a", "doc_b")
    }
    val resumed = Dedup.connectedComponents(pairs2, smallCutoff = 0L,
        restartDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rounds 1..2 were NOT replayed: their commit times are untouched
    // and the resumed run appended round=3 onward
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "round=1")) === round1Mtime)
    assert(new java.io.File(dir).list().exists(_ == "round=3"))

    val oneShot = Dedup.connectedComponents(pairs, smallCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === oneShot)
    assert(resumed.values.toSet === Set(0L))  // one path component, min id 0
  }

  test("pageRank resumes mid-loop from restartDir, ranks bit-identical") {
    val edges = (pathEdges ++ Seq((39L, 0L), (5L, 20L), (20L, 5L)))
      .toDF("src", "dst")
    val dir = tmpDir("graft-pr-restart")
    // the doomed run: completes only 2 of 5 rounds before "dying"
    Graph.pageRank(edges, iters = 2, restartDir = Some(dir))
      .collect()
    val round2Mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "round=2"))

    val spark2 = spark.newSession()
    val edges2 = {
      import spark2.implicits._
      (pathEdges ++ Seq((39L, 0L), (5L, 20L), (20L, 5L))).toDF("src", "dst")
    }
    val resumed = Graph.pageRank(edges2, iters = 5, restartDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2's commit is untouched (not replayed), rounds 3..5 appended
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "round=2")) === round2Mtime)
    assert(new java.io.File(dir).list().count(_.startsWith("round=")) === 5)

    val oneShot = Graph.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === oneShot)
  }

  test("bpeTrain distributed path resumes mid-schedule from restartDir, merges bit-identical") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "banana banana bandana"),
      (3L, "cabana banana and a bandana")
    ).toDF("doc_id", "text")
    val dir = tmpDir("graft-bpe-restart")
    // the doomed run: driverCutoff=0 forces the distributed one-job-per-
    // merge schedule; it completes only 2 of 4 merges before "dying"
    LangModel.bpeTrain(docs, nMerges = 2, driverCutoff = 0L,
      restartDir = Some(dir)).collect()
    val round2Mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "vocab", "round=2"))

    val spark2 = spark.newSession()
    val docs2 = {
      import spark2.implicits._
      Seq(
        (1L, "banana bandana cabana"),
        (2L, "banana banana bandana"),
        (3L, "cabana banana and a bandana")
      ).toDF("doc_id", "text")
    }
    val resumed = LangModel.bpeTrain(docs2, nMerges = 4, driverCutoff = 0L,
        restartDir = Some(dir))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, "vocab", "round=2")) === round2Mtime)
    assert(new java.io.File(s"$dir/vocab").list().exists(_ == "round=4"))

    val oneShot = LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(resumed === oneShot)
    assert(resumed.size === 4)
  }

  test("save commit is atomic: an in-progress write is invisible to latest()") {
    val dir = tmpDir("graft-restart-atomic")
    val st = Seq((1L, 2L)).toDF("u", "v")
    Restart.save(st, dir, 1)
    // a writer killed mid-write leaves only the in-progress dir
    st.write.mode("overwrite").parquet(s"$dir/.inprogress_round=2")
    val got = Restart.latest(spark, dir)
    assert(got.map(_._1) === Some(1))
    // and a committed round 2 supersedes it
    Restart.save(st, dir, 2)
    assert(Restart.latest(spark, dir).map(_._1) === Some(2))
  }

  test("a round dir without the commit marker (partial object-store rename) is not trusted") {
    val dir = tmpDir("graft-restart-marker")
    val st = Seq((1L, 2L)).toDF("u", "v")
    Restart.save(st, dir, 1)
    // a non-atomic rename killed mid-copy: round=2 EXISTS by name and
    // even holds valid parquet, but the copy may be truncated — only
    // the post-rename marker proves completeness
    st.write.mode("overwrite").parquet(s"$dir/round=2")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "round=2", Restart.CommitMarker))
    assert(Restart.latest(spark, dir).map(_._1) === Some(1))
    assert(Restart.read(spark, dir, 2).isEmpty)
    assert(Restart.read(spark, dir, 1).isDefined)
  }

  test("bpeTrain resumes across the merges-committed/vocab-missing crash window") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "banana banana bandana"),
      (3L, "cabana banana and a bandana")
    ).toDF("doc_id", "text")
    val dir = tmpDir("graft-bpe-orphan")
    LangModel.bpeTrain(docs, nMerges = 2, driverCutoff = 0L,
      restartDir = Some(dir)).collect()
    // the crash window: merges commit BEFORE vocab, so a driver lost
    // between the two leaves an orphan merges round with no vocab twin
    val orphan = Seq((3, "x", "y", "xy", 1L))
      .toDF("rank", "left", "right", "merged", "pair_count")
    Restart.save(orphan, s"$dir/merges", 3)

    val resumed = LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L,
        restartDir = Some(dir))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val oneShot = LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    // resume read merges round 2 (the vocab's twin), re-ran merges 3-4,
    // and re-committed over the orphan — the fake merge is nowhere
    assert(resumed === oneShot)
    assert(!resumed.exists(_._4 == "xy"))
  }

  test("bpeTrain with nMerges below the newest committed round returns the nMerges-run contract") {
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "banana banana bandana")
    ).toDF("doc_id", "text")
    val dir = tmpDir("graft-bpe-shrink")
    LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L,
      restartDir = Some(dir)).collect()
    // rounds are cumulative snapshots: asking the same dir for FEWER
    // merges must resume from round nMerges, not hand back all 4
    val shrunk = LangModel.bpeTrain(docs, nMerges = 2, driverCutoff = 0L,
        restartDir = Some(dir))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val fresh = LangModel.bpeTrain(docs, nMerges = 2, driverCutoff = 0L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(shrunk === fresh)
    assert(shrunk.size === 2)
  }

  test("restartEvery cadence: kill between commits resumes from the last committed round") {
    // pageRank, cadence 2: a run killed at round 3 has committed only
    // round 2 — the resume replays round 3 (≤ restartEvery-1 rounds)
    // and continues, bit-identical to the one-shot run
    val edges = (pathEdges ++ Seq((39L, 0L), (5L, 20L), (20L, 5L)))
      .toDF("src", "dst")
    val dir = tmpDir("graft-pr-cadence")
    Graph.pageRank(edges, iters = 3, restartDir = Some(dir), restartEvery = 2)
      .collect()
    assert(new java.io.File(dir).list().filter(_.startsWith("round=")).toSet
      === Set("round=2"))
    val resumed = Graph.pageRank(edges, iters = 5, restartDir = Some(dir),
        restartEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(new java.io.File(dir).list().filter(_.startsWith("round=")).toSet
      === Set("round=2", "round=4"))
    val oneShot = Graph.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed === oneShot)

    // connectedComponents, cadence 2: the doomed maxIter=3 run commits
    // only round 2; resume replays 3.. and converges identically
    val pairs = pathEdges.toDF("doc_a", "doc_b")
    val ccDir = tmpDir("graft-cc-cadence")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, maxIter = 3, smallCutoff = 0L,
        restartDir = Some(ccDir), restartEvery = 2)
    }
    assert(new java.io.File(ccDir).list().filter(_.startsWith("round=")).toSet
      === Set("round=2"))
    val cc = Dedup.connectedComponents(pairs, smallCutoff = 0L,
        restartDir = Some(ccDir), restartEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Dedup.connectedComponents(pairs, smallCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

    // bpeTrain, cadence 2: the doomed 3-merge run commits only round 2;
    // the 4-merge resume replays merge 3 and lands identical
    val docs = Seq(
      (1L, "banana bandana cabana"),
      (2L, "banana banana bandana"),
      (3L, "cabana banana and a bandana")
    ).toDF("doc_id", "text")
    val bpeDir = tmpDir("graft-bpe-cadence")
    LangModel.bpeTrain(docs, nMerges = 3, driverCutoff = 0L,
      restartDir = Some(bpeDir), restartEvery = 2).collect()
    assert(new java.io.File(s"$bpeDir/vocab").list()
      .filter(_.startsWith("round=")).toSet === Set("round=2"))
    val bpe = LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L,
        restartDir = Some(bpeDir), restartEvery = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(bpe === LangModel.bpeTrain(docs, nMerges = 4, driverCutoff = 0L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet)
  }

  test("pageRank rerun with fewer iters than the dir holds returns the fewer-iters ranks") {
    val edges = (pathEdges ++ Seq((39L, 0L), (5L, 20L), (20L, 5L)))
      .toDF("src", "dst")
    val dir = tmpDir("graft-pr-shrink")
    Graph.pageRank(edges, iters = 4, restartDir = Some(dir)).collect()
    val shrunk = Graph.pageRank(edges, iters = 2, restartDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shrunk === fresh)
  }

  test("connectedComponents fixpoint rerun when the saved round equals maxIter") {
    val pairs = pathEdges.toDF("doc_a", "doc_b")
    val dir = tmpDir("graft-cc-fixpoint")
    val done = Dedup.connectedComponents(pairs, smallCutoff = 0L,
        restartDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastSaved = new java.io.File(dir).list()
      .filter(_.startsWith("round=")).map(_.stripPrefix("round=").toInt).max
    // rerun over the finished dir with maxIter == the resumed round:
    // the loop gets ONE verification round (next == edges) instead of
    // being skipped into the non-convergence error
    val again = Dedup.connectedComponents(pairs, maxIter = lastSaved,
        smallCutoff = 0L, restartDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === done)
  }
}

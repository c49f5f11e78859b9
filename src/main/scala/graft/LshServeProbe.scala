package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, LshIndex}

/** Dev measurement: the LshIndex serving economics — ONE index build
  * plus N cheap probes vs N one-shot [[Dedup.crossNearDuplicates]]
  * calls that each re-derive the corpus side. Usage:
  *
  *   dev/run.sh graft.LshServeProbe [corpusDir] [nProbes] [sliceMod]
  *
  * corpusDir defaults to /root/testdata/sf0.1 (pass /tmp/graft-sf10-docs
  * after `dev/run.sh graft.ScaleUp docs100` for the dup-heavy 100×
  * point, or /tmp/graft-docs-distinct<n> after `ScaleUp docsdistinct`
  * for the corpus-sized-bands regime). Probe batches are disjoint
  * doc_id slices of corpus/sliceMod docs each (100 = the default ~1%
  * slices; 10000 = the ~100-doc streaming-ingest batch shape); every
  * probe's pair count is asserted equal between the two paths before
  * timing is trusted. */
object LshServeProbe {

  /** `LshServeProbe point <corpusDir> [nPoints]` — the POINT-LOOKUP
    * regime ("is this one document a dup of the indexed corpus?"):
    * one-doc probes against (a) the default unsorted index, (b) the
    * same index with the pushed band filter (pushdown without layout —
    * shows what the filter alone buys), and (c) the range-sorted
    * layout with the pushed filter (row-group skipping, the r13
    * shape). Pair counts asserted equal across all three before any
    * timing is trusted. Run against /tmp/graft-docs-distinct10000000
    * (ScaleUp docsdistinct 10000000) for the ≥10M-distinct-streams
    * regime the r12 addendum deferred. */
  private def pointProbe(spark: org.apache.spark.sql.SparkSession,
                         corpusDir: String, nPoints: Int): Unit = {
    import graft.ops.LshIndex
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 100 >= nPoints)
    def point(i: Int) = docs.where(col("doc_id") % 100 === i)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (plain, sorted) =
      if (sys.env.contains("LSH_POINT_PLAIN") && sys.env.contains("LSH_POINT_SORTED"))
        (sys.env("LSH_POINT_PLAIN"), sys.env("LSH_POINT_SORTED"))
      else {
        val p = java.nio.file.Files.createTempDirectory("graft-lsh-pp-plain").toString
        val s = java.nio.file.Files.createTempDirectory("graft-lsh-pp-sort").toString
        val (_, tPlain) = timed(LshIndex.build(corpus, p, shingleSize = 2))
        val (_, tSorted) = timed(LshIndex.build(corpus, s, shingleSize = 2,
          pointLayout = true))
        println(f"build: plain=$tPlain%.1fs sorted=$tSorted%.1fs " +
          f"(corpus=${corpus.count()})")
        (p, s)
      }
    // one-doc points COLLECTED to a literal relation: the point-lookup
    // caller HAS its document in hand — deriving it from the 10M-row
    // corpus via orderBy().limit(1) would cost a corpus scan per probe
    // evaluation and floor every path at that scan (measured 4.8 s/probe
    // before this fix — the index-side difference was invisible under it)
    import spark.implicits._
    def oneDoc(i: Int) = {
      val r = point(i).orderBy("doc_id").limit(1)
        .select("doc_id", "text").collect()(0)
      Seq((r.getLong(0), r.getString(1))).toDF("doc_id", "text")
    }
    val runs = (0 until nPoints).map { i =>
      val d = oneDoc(i)
      val (nA, tA) = timed(LshIndex.nearDuplicates(d, plain, threshold = 0.35).count())
      val (nB, tB) = timed(LshIndex.nearDuplicates(d, plain, threshold = 0.35,
        pushBandFilter = true).count())
      val (nC, tC) = timed(LshIndex.nearDuplicates(d, sorted, threshold = 0.35,
        pushBandFilter = true).count())
      val (nD, tD) = timed(LshIndex.pointNearDuplicates(d, sorted,
        threshold = 0.35).count())
      require(nA == nB && nB == nC && nC == nD,
        s"point $i: $nA/$nB/$nC/$nD pairs — invalid")
      (tA, tB, tC, tD)
    }
    val (a, b, c, d) = (runs.map(_._1).sum / nPoints,
      runs.map(_._2).sum / nPoints, runs.map(_._3).sum / nPoints,
      runs.map(_._4).sum / nPoints)
    println(f"point serve s/probe: fullscan=$a%.2f pushed-unsorted=$b%.2f " +
      f"pushed-sorted=$c%.2f two-phase-point=$d%.2f (n=$nPoints)")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("point")) {
      val spark = GraftSession.local("lsh-point-probe")
      spark.sparkContext.setLogLevel("ERROR")
      pointProbe(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(5))
      spark.stop(); return
    }
    val corpusDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sliceMod = args.drop(2).headOption.map(_.toInt).getOrElse(100)
    val spark = GraftSession.local("lsh-serve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    val corpus = docs.where(col("doc_id") % sliceMod >= nProbes)
    def batch(i: Int) = docs.where(col("doc_id") % sliceMod === i)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // one-shot: each probe re-derives the corpus bands + shingles
    val oneShot = (0 until nProbes).map { i =>
      timed(Dedup.crossNearDuplicates(batch(i), corpus,
        shingleSize = 2, threshold = 0.35).count())
    }
    // indexed: one build, then probes touch only persisted relations
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-serve").toString
    val (_, tBuild) = timed(LshIndex.build(corpus, dir, shingleSize = 2))
    val served = (0 until nProbes).map { i =>
      timed(LshIndex.nearDuplicates(batch(i), dir, threshold = 0.35).count())
    }
    oneShot.zip(served).zipWithIndex.foreach { case (((a, _), (b, _)), i) =>
      require(a == b, s"probe $i: one-shot $a pairs vs indexed $b — invalid")
    }
    val (sumOne, sumServe) = (oneShot.map(_._2).sum, served.map(_._2).sum)
    println(f"corpus=${corpus.count()} probes=$nProbes " +
      f"oneShot=${sumOne}%.1fs (${sumOne / nProbes}%.2f s/probe) " +
      f"build=${tBuild}%.1fs serve=${sumServe}%.1fs " +
      f"(${sumServe / nProbes}%.2f s/probe) " +
      f"cumulative ${(tBuild + sumServe) / sumOne}%.2fx of one-shot at N=$nProbes")
    spark.stop()
  }
}

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
  def main(args: Array[String]): Unit = {
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

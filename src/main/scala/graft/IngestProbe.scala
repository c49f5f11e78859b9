package graft

import org.apache.spark.sql.functions._

import graft.ops.LshIndex
import graft.streaming.IngestStream

/** Dev measurement: the streaming ingest-dedup cycle against a growing
  * LSH index — per-batch wall as shards accrete, at real dup density.
  * Usage:
  *
  *   dev/run.sh graft.IngestProbe [corpusDir] [nBatches]
  *
  * corpusDir defaults to /root/testdata/sf0.1; pass /tmp/graft-sf10-docs
  * (after `dev/run.sh graft.ScaleUp docs100`) for the ~99%-exact-dup
  * 100× point. The index is built over the docs outside the batch
  * slices; each batch is a disjoint ~1% doc_id slice pushed through
  * [[IngestStream.ingestBatch]] (the fused probe + survivor append). */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-probe").toString
    val (idxDir, sinkDir) = (s"$base/idx", s"$base/sink")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = timed(LshIndex.build(
      docs.where(col("doc_id") % 100 >= nBatches), idxDir, shingleSize = 2))
    val perBatch = (0 until nBatches).map { i =>
      val batch = docs.where(col("doc_id") % 100 === i)
      val (_, t) = timed(IngestStream.ingestBatch(batch.toDF(), i.toLong,
        idxDir, sinkDir, threshold = 0.35))
      val survivors = spark.read.parquet(s"$sinkDir/batch=$i").count()
      (t, batch.count(), survivors)
    }
    val detail = perBatch.zipWithIndex.map { case ((t, n, s), i) =>
      f"b$i=$t%.1fs($s/$n)" }.mkString(" ")
    println(f"corpus=${docs.count()} build=${tBuild}%.1fs " +
      f"batches=$nBatches avg=${perBatch.map(_._1).sum / nBatches}%.1fs/batch " +
      detail)
    spark.stop()
  }
}

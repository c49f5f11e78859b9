package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Dev measurement surface: IVF-PQ recall vs (ks, nprobe) on the
  * synthetic embeddings fixture — the near-uniform worst case for any
  * ANN structure (cf. the SRP occupancy sweeps in SCALE.md). Pins the
  * honest floor PqSpec asserts and records the knob curve. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("pqprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = em.where(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(q, em, k = 5)
    for (ks <- Seq(8, 16); nlist <- Seq(8); nprobe <- Seq(2, 4, 8)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"pq-$ks-$nprobe").toString
      val t0 = System.nanoTime()
      Pq.buildIvfPqIndex(em, dir, m = 8, ks = ks, nlist = nlist)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val approx = Pq.ivfPqTopKIndexed(q, dir, k = 5, nprobe = nprobe)
      val r = Similarity.annRecall(truth, approx)
        .agg(avg("recall_ppm")).head().getDouble(0)
      val tServe = (System.nanoTime() - t1) / 1e9
      println(f"ks=$ks nlist=$nlist nprobe=$nprobe recall_ppm=$r%.0f " +
        f"build=$tBuild%.2fs serve=$tServe%.2fs")
    }
    val flat = Pq.topK(q, em, k = 5, m = 8, ks = 16)
    val rf = Similarity.annRecall(truth, flat)
      .agg(avg("recall_ppm")).head().getDouble(0)
    println(f"flat m=8 ks=16 recall_ppm=$rf%.0f")
    val flat2 = Pq.topK(q, em, k = 5, m = 16, ks = 16)
    val rf2 = Similarity.annRecall(truth, flat2)
      .agg(avg("recall_ppm")).head().getDouble(0)
    println(f"flat m=16 ks=16 recall_ppm=$rf2%.0f")
    for (refine <- Seq(2, 4, 8, 16)) {
      val ref = Pq.topKRefined(q, em, k = 5, m = 8, ks = 16, refine = refine)
      val rr = Similarity.annRecall(truth, ref)
        .agg(avg("recall_ppm")).head().getDouble(0)
      println(f"refined m=8 ks=16 refine=$refine recall_ppm=$rr%.0f")
    }
    spark.stop()
  }
}

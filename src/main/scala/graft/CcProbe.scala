package graft

import org.apache.spark.sql.functions._

/** Dev-only: round-count + phase timing of connectedComponents on the
  * q42 input. Not part of the engine surface. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("cc-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = ops.Dedup.nearDuplicates(docs, "text", 8, 2, 2, 0.35)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val t1 = System.nanoTime()
    println(f"pairs: $nPairs rows in ${(t1 - t0) / 1e9}%.2f s")
    val cc = ops.Dedup.connectedComponents(pairs)
    val n = cc.count()
    val t2 = System.nanoTime()
    println(f"components: $n rows in ${(t2 - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
